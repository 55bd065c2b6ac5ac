"""Training CLI — `python -m mtlx.train.train --pipeline_config_path=...
--train_dir=...` (reference object_detection/train.py CLI parity,
SURVEY.md §4.1).

The reference's trainer stack (input queues, model_deploy clones, PS
devices, slim.learning.train) collapses into: host loader -> device
prefetch -> ONE jitted train step (forward both stages + aux heads, loss,
grad, update) data-parallel over the mesh. Checkpoints via orbax (async),
metrics to stdout + TensorBoard event files.

Distribution flags (--num_clones, --ps_tasks, --worker_replicas) have no
equivalent: a single SPMD program spans all local devices, and multi-host
runs launch the same command per host (jax.distributed).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def make_augmented_batch_fn(aug_options):
    """Returns augment(rng, step, batch) -> batch with data augmentation
    applied under a key that varies per train step.

    The step counter (a traced scalar inside jit) is folded into the key:
    with a loop-invariant key, batch-slot i would make the same
    flip/crop/color decision at every step of the entire run (regression:
    tests/test_train_loop.py)."""
    import jax
    import jax.numpy as jnp

    from mtlx.data import preprocessor as prep

    def augment(rng, step, batch):
        if "aug_window" in batch:
            # host-drawn variable-size crop/pad geometry (mtlx/data/
            # host_geometry.py): materialize the pixels with one bilinear
            # window-resample; boxes/true_shape were rewritten host-side
            batch = dict(batch)
            window = batch.pop("aug_window")
            src_shape = batch.pop("aug_src_shape")
            content = batch.pop("aug_content", None)
            batch["image"] = prep.batch_apply_host_window(
                batch["image"].astype(jnp.float32),
                batch["true_shape"],
                window,
                src_shape,
                batch.pop("aug_pad_color"),
                content,
            )
            if "gt_instance_masks" in batch:
                # instance masks ride the same window at mask_stride
                # resolution (the [G] instances are the resample's
                # channels); loader paste used round(true/stride), so the
                # mask-frame extents round the same way
                m = batch["gt_instance_masks"]  # [B, G, mh, mw]
                ms = batch["image"].shape[1] // m.shape[2]
                g = m.shape[1]
                soft = prep.batch_apply_host_window(
                    jnp.transpose(m, (0, 2, 3, 1)).astype(jnp.float32),
                    jnp.maximum(
                        jnp.round(batch["true_shape"] / ms), 1
                    ).astype(jnp.int32),
                    window / ms,
                    jnp.maximum(jnp.round(src_shape / ms), 1).astype(jnp.int32),
                    jnp.zeros((m.shape[0], g), jnp.float32),
                    content / ms if content is not None else None,
                )
                batch["gt_instance_masks"] = jnp.transpose(soft, (0, 3, 1, 2))
        if not aug_options:
            return batch
        aug_rng = jax.random.fold_in(rng, step)
        sample = {
            "image": batch["image"].astype(jnp.float32),
            "boxes": batch["gt_boxes"],
            "classes": batch["gt_classes"],
            "mask": batch["gt_mask"],
            "true_shape": batch["true_shape"],
        }
        has_inst = "gt_instance_masks" in batch
        has_kp = "gt_keypoints" in batch
        if has_inst or has_kp:
            unsafe = [n for n, _ in aug_options
                      if n not in prep.MASK_SAFE_TRANSFORMS]
            if unsafe:
                raise ValueError(
                    "instance masks/keypoints are loaded but these "
                    f"augmentations do not transform them: {unsafe} — "
                    "remove them or disable the annotation loading"
                )
        if has_inst:
            sample["instance_masks"] = batch["gt_instance_masks"]
        if has_kp:
            sample["keypoints"] = batch["gt_keypoints"]
        out = prep.batch_preprocess(aug_rng, sample, aug_options)
        new = dict(
            batch, image=out["image"], gt_boxes=out["boxes"], gt_mask=out["mask"],
            true_shape=out["true_shape"],
        )
        if has_inst:
            new["gt_instance_masks"] = out["instance_masks"]
        if has_kp:
            new["gt_keypoints"] = out["keypoints"]
        return new

    return augment


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pipeline_config_path", required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--num_steps", type=int, default=None,
                   help="override train_config.num_steps")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) before backend init")
    p.add_argument("--profile_from", type=int, default=0,
                   help="start a jax.profiler trace at this step (0 = off); "
                        "trace is written under <train_dir>/profile "
                        "(reference trace_every_n_steps equivalent, "
                        "SURVEY.md §6.1)")
    p.add_argument("--profile_steps", type=int, default=5,
                   help="number of steps to trace")
    p.add_argument("--deterministic", action="store_true",
                   help="fixed data order + PRNG keys (always true for the "
                        "PRNG; this additionally disables shuffling)")
    p.add_argument("--decode_threads", type=int, default=2,
                   help=">0 decodes each batch's JPEGs through the native "
                        "GIL-free thread pool (mtlx/data/_imgcodec.cc); "
                        "0 = single-threaded PIL/native decode")
    p.add_argument("--grain_workers", type=int, default=0,
                   help=">0 uses the grain multiprocess loader with this "
                        "many workers (production host input parallelism)")
    p.add_argument("--tf1_resize", action="store_true",
                   help="use the reference's TF1 resize_images "
                        "(align_corners=False) convention for the initial "
                        "image resize — for mAP-parity runs against TF "
                        "checkpoints")
    p.add_argument("--pack_transfer", type=int, default=1,
                   help="1 = ship images cropped to the 128-bucketed true "
                        "shape and pad to the canvas on device — cuts "
                        "host->device bytes on keep-aspect configs; each "
                        "distinct bucket adds one jit specialization. "
                        "0 = always transfer the full canvas")
    p.add_argument("--aspect_grouping", type=int, default=1,
                   help="1 = batch records sharing a compute bucket "
                        "together (a mixed portrait/landscape batch "
                        "forces the full-canvas bucket, erasing the "
                        "bucketed-compute win); 0 = plain shuffled "
                        "batches. Only meaningful with --pack_transfer")
    from mtlx.utils.bucketing import bucket_multiple_arg

    p.add_argument("--bucket_multiple", type=bucket_multiple_arg, default=0,
                   help="transfer/compute bucket granularity in pixels "
                        "(multiple of 32). Finer buckets compute and "
                        "ship fewer padding rows — measured +13%% train "
                        "img/s at 32 on the R101 COCO point "
                        "(tools/bucket_sweep.py) — at the cost of more "
                        "jit bucket variants (--precompile_buckets "
                        "covers them up front). Overrides the pipeline's "
                        "`bucketing {}` block; default 128")
    p.add_argument("--max_bucket_variants", type=int, default=0,
                   help="bound the compute-bucket set to at most N "
                        "shapes: the N most frequent per-record buckets "
                        "are kept (plus the full canvas) and rarer "
                        "buckets pad up to their nearest kept superset. "
                        "Makes fine --bucket_multiple granularity "
                        "production-viable on varied-aspect datasets "
                        "without an unbounded jit-variant count. "
                        "0 = no bound. Only meaningful with "
                        "--pack_transfer")
    p.add_argument("--precompile_buckets", action="store_true",
                   help="scan the dataset's image headers, enumerate every "
                        "compute-bucket shape its batches can produce, and "
                        "AOT-compile the train step for each before step 1 "
                        "— no mid-run XLA compile stall when a rare bucket "
                        "first appears (only meaningful with --pack_transfer)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(coordinator/process env vars per the standard JAX "
                        "launch contract); every host runs this same "
                        "command and feeds its shard of the data")
    # reference TF1 cluster flags, accepted so existing launch scripts run
    # unmodified; they configured the queue-runner/PS architecture this
    # SPMD program replaces (a note is printed when set non-default)
    for flag, default in (("--master", ""), ("--task", 0),
                          ("--num_clones", 1), ("--clone_on_cpu", False),
                          ("--worker_replicas", 1), ("--ps_tasks", 0),
                          ("--worker_job_name", "lonely_worker")):
        kw = {"default": default}
        if isinstance(default, bool):
            kw = {"action": "store_true"}
        elif isinstance(default, int):
            kw["type"] = int
        p.add_argument(flag, help=argparse.SUPPRESS, **kw)
    args = p.parse_args(argv)
    for flag, default in (("master", ""), ("task", 0), ("num_clones", 1),
                          ("clone_on_cpu", False), ("worker_replicas", 1),
                          ("ps_tasks", 0)):
        if getattr(args, flag) != default:
            print(f"[train] note: --{flag} is a TF1 cluster knob; this "
                  "SPMD program has no clones/PS — use --distributed + "
                  "the JAX multi-host launch contract instead (ignored)",
                  flush=True)
    return args


def main(argv=None):
    import sys as _sys

    # finer GIL switching: the prefetch producer thread and the step
    # dispatch otherwise starve each other on few-core hosts (measured:
    # producer 148 -> 175 img/s at 1ms vs the 5ms default)
    _sys.setswitchinterval(0.001)
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    if args.distributed:
        jax.distributed.initialize()
    import jax.numpy as jnp

    from mtlx.builders import (
        model_builder,
        optimizer_builder,
        preprocessor_builder,
    )
    from mtlx.builders.model_builder import resizer_params
    from mtlx.config import config_util
    from mtlx.data.loader import DetectionDataset, batches, device_prefetch
    from mtlx.parallel import mesh as mesh_lib
    from mtlx.train import checkpoints as ckpt_lib
    from mtlx.train.train_step import (
        create_train_state,
        make_regularization_fn,
        make_train_step,
        pad_for_model,
    )
    from mtlx.utils.summary_writer import SummaryWriter

    configs = config_util.get_configs_from_pipeline_file(args.pipeline_config_path)
    for note in config_util.compatibility_notes(configs):
        print(f"[train] note: {note}", flush=True)
    from mtlx.utils import bucketing

    max_bucket_variants = bucketing.resolve_bucketing(
        configs.get("bucketing"), args.bucket_multiple,
        args.max_bucket_variants,
    )
    # record the resolved operating point so the pipeline.config saved
    # into train_dir (and later exported) carries it: a model trained at
    # --bucket_multiple 32 evals/serves at 32 without re-passing flags
    configs["bucketing"].bucket_multiple = bucketing.bucket_multiple()
    configs["bucketing"].max_bucket_variants = max_bucket_variants
    train_config = configs["train_config"]
    model = model_builder.build(
        configs["model"], is_training=True,
        max_gt_boxes=train_config.max_number_of_boxes or 100,
    )
    num_steps = args.num_steps or train_config.num_steps or 200000
    batch_size = train_config.batch_size or 1

    os.makedirs(args.train_dir, exist_ok=True)
    config_util.save_pipeline_config(
        config_util.create_pipeline_proto_from_configs(configs), args.train_dir
    )

    tx, lr_schedule, ema_decay = optimizer_builder.build(
        train_config.optimizer, train_config
    )
    aug_options = preprocessor_builder.build(train_config.data_augmentation_options)
    reg_fn = make_regularization_fn(
        model_builder.regularization_scopes(configs["model"])
    )

    # data
    resizer = resizer_params(_image_resizer(configs["model"]))
    # crop/pad-family augmentations with a keep-aspect resizer change the
    # FINAL image size like the reference's crop-then-resize pipeline:
    # their geometry is drawn host-side and the bucket machinery computes
    # at the real post-crop shape (mtlx/data/host_geometry.py)
    from mtlx.data.host_geometry import HostGeometry, split_host_geometry

    host_geo_ops, aug_options = split_host_geometry(aug_options, resizer)
    host_geometry = None
    if host_geo_ops:
        host_geometry = HostGeometry(
            host_geo_ops, resizer[1]["min_dimension"],
            resizer[1]["max_dimension"], model.cfg.canvas_size,
        )
        print(f"[train] host-side variable-size geometry: "
              f"{[n for n, _ in host_geo_ops]}", flush=True)

    input_config = configs["train_input_config"]
    paths = list(input_config.tf_record_input_reader.input_path)
    dataset = DetectionDataset(
        paths,
        canvas_size=model.cfg.canvas_size,
        resizer=resizer,
        max_boxes=model.cfg.max_gt_boxes,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        load_instance_masks=(
            input_config.load_instance_masks
            and getattr(model.cfg, "predict_instance_masks", False)
        ),
        num_keypoints=input_config.num_keypoints,
        tf1_resize=args.tf1_resize,
    )
    print(f"[train] {len(dataset)} examples, batch {batch_size}, "
          f"canvas {model.cfg.canvas_size}, {num_steps} steps", flush=True)

    # state (+ resume / warm start, reference §6.4 two modes)
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), tx, keep_ema=ema_decay is not None
    )
    manager = ckpt_lib.CheckpointManager(
        args.train_dir,
        keep_every_n_hours=train_config.keep_checkpoint_every_n_hours,
    )
    latest = manager.latest_step()
    if latest is not None:
        state = manager.restore(state)
        print(f"[train] resumed from step {latest}", flush=True)
    elif train_config.fine_tune_checkpoint:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        variables, restored, skipped = ckpt_lib.restore_warm_start(
            variables,
            train_config.fine_tune_checkpoint,
            train_config.from_detection_checkpoint,
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"],
            ema_params=(
                jax.tree_util.tree_map(jnp.asarray, variables["params"])
                if state.ema_params is not None else None
            ),
        )
        print(f"[train] warm start: {restored} restored, {skipped} skipped", flush=True)

    mesh = mesh_lib.create_mesh_for_batch(batch_size)
    state = mesh_lib.replicate(mesh, state)
    raw_step = make_train_step(model, regularization_fn=reg_fn, ema_decay=ema_decay)

    augment = make_augmented_batch_fn(aug_options)

    def step_fn(state, batch, rng):
        # bucketed compute: packed batches stay at their 128-bucket; the
        # detector's anchors/normalizations follow the bucket (the padded
        # canvas region is never computed on)
        batch = pad_for_model(model, batch)
        batch = augment(jax.random.fold_in(rng, 0), state.step, batch)
        return raw_step(state, batch, jax.random.fold_in(rng, 1))

    step = jax.jit(
        step_fn,
        in_shardings=(
            mesh_lib.replicated(mesh),
            mesh_lib.batch_sharding(mesh),
            mesh_lib.replicated(mesh),
        ),
        donate_argnums=(0,),
    )

    writer = SummaryWriter(args.train_dir)
    rng = jax.random.PRNGKey(args.seed + 1)
    if args.precompile_buckets:
        if args.pack_transfer and getattr(model, "supports_bucketed_compute", False):
            from mtlx.data.loader import achievable_bucket_shapes

            t0 = time.time()
            # with host geometry the achievable set is the full bucket
            # grid (pack_shape can land between the post-crop and record
            # buckets), and the batch template carries the aug_* fields
            # real batches will have
            shapes = achievable_bucket_shapes(
                dataset, batch_size, host_geometry=host_geometry,
                max_bucket_variants=max_bucket_variants,
            )
            sample = dataset.get(0)
            if host_geometry is not None:
                sample = host_geometry(sample, np.random.default_rng(0))
            drop = {"gt_difficult", "gt_group_of", "original_shape",
                    "source_id", "pack_shape"}
            # the SDS leaves must carry the same sharding device_prefetch
            # commits real batches with — an unsharded SDS lowers to a
            # different cache key and the call recompiles anyway
            bsh = mesh_lib.batch_sharding(mesh)
            template = {
                k: jax.ShapeDtypeStruct((batch_size,) + np.asarray(v).shape,
                                        np.asarray(v).dtype, sharding=bsh)
                for k, v in sample.items() if k not in drop
            }
            for hb, wb in shapes:
                template["image"] = jax.ShapeDtypeStruct(
                    (batch_size, hb, wb, sample["image"].shape[-1]),
                    sample["image"].dtype, sharding=bsh,
                )
                step.lower(state, template, rng).compile()
            print(f"[train] precompiled {len(shapes)} bucket variants "
                  f"{shapes} in {time.time() - t0:.1f}s", flush=True)
        else:
            print("[train] note: --precompile_buckets needs --pack_transfer "
                  "and a bucketed-compute model; skipped", flush=True)
    shuffle = input_config.shuffle and not args.deterministic
    # input_reader.num_epochs: 0 = repeat forever (reference tf.train
    # string_input_producer semantics); otherwise the run ends when the
    # dataset is exhausted, even before num_steps.
    num_epochs = input_config.num_epochs or None
    if args.grain_workers > 0:
        from mtlx.data.grain_loader import make_grain_loader

        host_iter = (
            dict(b) for b in make_grain_loader(
                dataset, batch_size, seed=args.seed, shuffle=shuffle,
                worker_count=args.grain_workers, num_epochs=num_epochs,
                pack_images=bool(args.pack_transfer),
                aspect_grouping=bool(args.aspect_grouping),
                host_geometry=host_geometry,
                max_bucket_variants=max_bucket_variants,
            )
        )
    else:
        host_iter = batches(dataset, batch_size, shuffle=shuffle,
                            seed=args.seed, decode_threads=args.decode_threads,
                            epochs=num_epochs, host_geometry=host_geometry,
                            pack_images=bool(args.pack_transfer),
                            aspect_grouping=bool(args.aspect_grouping),
                            max_bucket_variants=max_bucket_variants)
    data_iter = device_prefetch(
        host_iter,
        sharding=mesh_lib.batch_sharding(mesh),
    )
    save_every = train_config.save_checkpoints_steps or 1000
    t_log = time.time()
    profiling = False
    # host-side step counter: reading int(state.step) every iteration would
    # block on the just-dispatched step and serialize host with device
    cur = int(state.step)
    for batch, _ in data_iter:
        if cur >= num_steps:
            break
        if args.profile_from and cur == args.profile_from:
            jax.profiler.start_trace(os.path.join(args.train_dir, "profile"))
            profiling = True
        if profiling and cur >= args.profile_from + args.profile_steps:
            jax.profiler.stop_trace()
            profiling = False
        drop = {"gt_difficult", "gt_group_of", "original_shape"}
        batch = {k: v for k, v in batch.items() if k not in drop}
        state, metrics = step(state, batch, rng)
        cur += 1
        if cur % args.log_every == 0 or cur == 1:
            metrics = jax.device_get(metrics)
            dt = time.time() - t_log
            ips = args.log_every * batch_size / dt if cur > 1 else 0.0
            t_log = time.time()
            lr = lr_schedule(cur) if callable(lr_schedule) else lr_schedule
            line = {
                "step": cur,
                "images_per_sec": round(float(ips), 2),
                "learning_rate": float(lr),
                **{k: round(float(v), 4) for k, v in metrics.items()},
            }
            print("[train] " + json.dumps(line), flush=True)
            for k, v in metrics.items():
                writer.scalar(k, float(v), cur)
            writer.scalar("learning_rate", float(lr), cur)
            writer.scalar("global_step/sec", ips / max(batch_size, 1), cur)
            writer.flush()
        if cur % save_every == 0 or cur >= num_steps:
            manager.save(cur, jax.device_get(state))
    if profiling:
        jax.profiler.stop_trace()
    manager.save(int(state.step), jax.device_get(state))
    manager.wait()
    writer.close()
    print(f"[train] done at step {int(state.step)}", flush=True)


def _image_resizer(model_proto):
    which = model_proto.WhichOneof("model")
    return getattr(model_proto, which).image_resizer


if __name__ == "__main__":
    main()
