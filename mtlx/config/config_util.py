"""Pipeline-config read/write/merge (reference utils/config_util.py,
SURVEY.md §6.6). The text-format TrainEvalPipelineConfig is the public
API; this module is the read/merge layer the CLIs use."""

from __future__ import annotations

import os
from typing import Dict

from google.protobuf import text_format

from mtlx.config.protos import pipeline_pb2


def get_configs_from_pipeline_file(path: str) -> Dict:
    """Read a TrainEvalPipelineConfig text proto -> dict of its 5 sections
    (reference get_configs_from_pipeline_file contract)."""
    pipeline = pipeline_pb2.TrainEvalPipelineConfig()
    with open(path, "r") as f:
        text_format.Parse(f.read(), pipeline)
    return {
        "model": pipeline.model,
        "train_config": pipeline.train_config,
        "train_input_config": pipeline.train_input_reader,
        "eval_config": pipeline.eval_config,
        "eval_input_config": pipeline.eval_input_reader,
        # TPU-native addition: pipeline-level compute-bucket knobs (one
        # source of truth for train/eval/serving; see pipeline.proto)
        "bucketing": pipeline.bucketing,
    }


def create_pipeline_proto_from_configs(configs: Dict):
    pipeline = pipeline_pb2.TrainEvalPipelineConfig()
    pipeline.model.CopyFrom(configs["model"])
    pipeline.train_config.CopyFrom(configs["train_config"])
    pipeline.train_input_reader.CopyFrom(configs["train_input_config"])
    pipeline.eval_config.CopyFrom(configs["eval_config"])
    pipeline.eval_input_reader.CopyFrom(configs["eval_input_config"])
    if "bucketing" in configs:
        pipeline.bucketing.CopyFrom(configs["bucketing"])
    return pipeline


def save_pipeline_config(pipeline, directory: str, filename: str = "pipeline.config"):
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, filename)
    with open(path, "w") as f:
        f.write(text_format.MessageToString(pipeline))
    return path


def merge_external_params_with_configs(configs: Dict, **kwargs) -> Dict:
    """Apply simple overrides (reference merge_external_params_with_configs
    subset: learning_rate, batch_size, train/eval input paths, label map)."""
    for key, value in kwargs.items():
        if value is None:
            continue
        if key == "batch_size":
            configs["train_config"].batch_size = int(value)
        elif key == "train_steps":
            configs["train_config"].num_steps = int(value)
        elif key == "learning_rate":
            _set_initial_learning_rate(configs["train_config"].optimizer, float(value))
        elif key == "train_input_path":
            del configs["train_input_config"].tf_record_input_reader.input_path[:]
            configs["train_input_config"].tf_record_input_reader.input_path.append(value)
        elif key == "eval_input_path":
            del configs["eval_input_config"].tf_record_input_reader.input_path[:]
            configs["eval_input_config"].tf_record_input_reader.input_path.append(value)
        elif key == "label_map_path":
            configs["train_input_config"].label_map_path = value
            configs["eval_input_config"].label_map_path = value
        else:
            raise ValueError(f"unknown override {key}")
    return configs


def _set_initial_learning_rate(optimizer, lr: float):
    which = optimizer.WhichOneof("optimizer")
    opt = getattr(optimizer, which)
    sched = opt.learning_rate.WhichOneof("learning_rate")
    rate = getattr(opt.learning_rate, sched)
    if sched == "constant_learning_rate":
        rate.learning_rate = lr
    elif sched == "exponential_decay_learning_rate":
        rate.initial_learning_rate = lr
    elif sched == "manual_step_learning_rate":
        rate.initial_learning_rate = lr
    elif sched == "cosine_decay_learning_rate":
        rate.learning_rate_base = lr


# TF1 queue-runner / parameter-server knobs that have no equivalent in a
# single-program SPMD input pipeline. They are accepted for config
# compatibility (the text proto is the public API) and reported as
# ignored rather than silently dropped.
_QUEUE_ERA_TRAIN_FIELDS = (
    "batch_queue_capacity", "num_batch_queue_threads",
    "prefetch_queue_capacity", "startup_delay_steps",
    "replicas_to_aggregate",
)
_QUEUE_ERA_READER_FIELDS = ("queue_capacity", "min_after_dequeue",
                            "num_readers")
_TF1_EVAL_FIELDS = ("save_graph", "eval_master")


def compatibility_notes(configs: Dict) -> list:
    """Human-readable notes for accepted-but-inapplicable TF1-era knobs
    that are explicitly set in the config. The JAX pipeline replaces queue
    runners with device prefetch and the PS architecture with synchronous
    SPMD (== sync_replicas: true semantics)."""
    notes = []
    tc = configs.get("train_config")
    if tc is not None:
        for f in _QUEUE_ERA_TRAIN_FIELDS:
            if tc.HasField(f):
                notes.append(
                    f"train_config.{f}={getattr(tc, f)} is a TF1 queue/PS "
                    "knob; the prefetching SPMD input pipeline has no "
                    "equivalent (ignored)"
                )
        if tc.HasField("sync_replicas"):
            notes.append(
                f"train_config.sync_replicas={tc.sync_replicas}: training "
                "is always synchronous data-parallel (psum over the mesh); "
                "async parameter-server mode does not exist here"
            )
    for key in ("train_input_config", "eval_input_config"):
        rc = configs.get(key)
        if rc is None:
            continue
        for f in _QUEUE_ERA_READER_FIELDS:
            if rc.HasField(f):
                notes.append(
                    f"{key}.{f}={getattr(rc, f)} is a TF1 queue knob; "
                    "reading is sequential + thread-pooled decode (ignored)"
                )
    ec = configs.get("eval_config")
    if ec is not None:
        for f in _TF1_EVAL_FIELDS:
            if ec.HasField(f):
                notes.append(
                    f"eval_config.{f} is TF1 graph/cluster machinery with "
                    "no JAX equivalent (ignored)"
                )
    return notes
