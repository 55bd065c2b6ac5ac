"""Oxford-IIIT Pet TFRecord writer (reference create_pet_tf_record.py,
SURVEY.md §3.5): breed-from-filename labeling + layout walk."""

import io
import os

import numpy as np
import pytest

from mtlx.data import pet, tfrecord
from mtlx.data.example_decoder import decode_example

XML = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object><name>cat</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>60</xmax><ymax>70</ymax></bndbox>
  </object>
</annotation>"""


def test_class_name_from_filename():
    assert pet.get_class_name_from_filename("Abyssinian_100.jpg") == "Abyssinian"
    assert (
        pet.get_class_name_from_filename("american_pit_bull_terrier_32.jpg")
        == "american_pit_bull_terrier"
    )
    with pytest.raises(ValueError):
        pet.get_class_name_from_filename("nounderscore.jpg")


def test_create_pet_tf_record(tmp_path):
    from PIL import Image

    root = tmp_path / "pet"
    (root / "images").mkdir(parents=True)
    (root / "annotations" / "xmls").mkdir(parents=True)
    names = ["Abyssinian_1", "beagle_2", "Bengal_7"]
    for name in names:
        buf = io.BytesIO()
        Image.fromarray(np.zeros((80, 100, 3), np.uint8)).save(buf, format="JPEG")
        (root / "images" / f"{name}.jpg").write_bytes(buf.getvalue())
        (root / "annotations" / "xmls" / f"{name}.xml").write_text(
            XML.format(name=name)
        )
    # one listed example lacks an xml -> skipped, as in the reference
    (root / "annotations" / "trainval.txt").write_text(
        "\n".join(names + ["pug_9"]) + "\n"
    )
    out = str(tmp_path / "pet.record")
    n = pet.create_pet_tf_record(str(root), out)
    assert n == 3

    records = list(tfrecord.read_records(out))
    assert len(records) == 3
    label_map = {c: i + 1 for i, c in enumerate(pet.PET_CLASSES)}
    dec = decode_example(records[0], decode_image=False)
    # class is the filename breed, not the XML's 'cat'
    assert dec["groundtruth_classes"].tolist() == [label_map["Abyssinian"]]
    np.testing.assert_allclose(
        dec["groundtruth_boxes"][0], [20 / 80, 10 / 100, 70 / 80, 60 / 100],
        rtol=1e-5,
    )
    dec2 = decode_example(records[1], decode_image=False)
    assert dec2["groundtruth_classes"].tolist() == [label_map["beagle"]]


def test_pet_label_map_shipped():
    path = os.path.join(
        os.path.dirname(pet.__file__), "label_maps", "pet_label_map.pbtxt"
    )
    from mtlx.utils import label_map_util

    d = label_map_util.get_label_map_dict(path)
    assert len(d) == 37 and d["Abyssinian"] == 1
