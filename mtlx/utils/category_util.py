"""Category list I/O (reference utils/category_util.py): load/save the
[{'id', 'name'}] category lists the evaluator consumes from CSV files."""

from __future__ import annotations

import csv
from typing import List


def load_categories_from_csv_file(path: str) -> List[dict]:
    categories = []
    with open(path, newline="") as f:
        for row in csv.reader(f):
            if not row:
                continue
            categories.append({"id": int(row[0]), "name": row[1]})
    return categories


def save_categories_to_csv_file(categories: List[dict], path: str) -> None:
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        for cat in sorted(categories, key=lambda c: c["id"]):
            writer.writerow([cat["id"], cat["name"]])
