"""Command-line interface.

Subcommands mirror the reference's entry points (SURVEY.md §2 L6):

- `train`      — the main trainer (reference train.py:41-91): model
                 choice, block loaders, Adam + masked CE, periodic
                 metrics, final (and periodic) checkpoints.
- `prepare`    — offline ETL: raw -> areas -> chunks -> index -> blocks
                 (reference prepare_s3dis.py / split_s3dis_data.py /
                 precompute_chunk_index.py / preprocess_dataset.py).
- `evaluate`   — checkpoint evaluation over block or whole-room data
                 with sliding-window inference (reference
                 models/dgcnn/evaluate.py, utils.py:134-258).
- `benchmark`  — latency/FPS/points-per-sec micro-benchmark (reference
                 models/dgcnn/utils.py:358-412).
- `train-legacy` — the legacy/chunked stack trainer (reference
                 Training/train_model.py:230-287).

Defaults match the reference configuration (train.py:17-37): Adam
lr=1e-3, 10 epochs, batch 8/2, 4096 points, test area 6, 14 classes.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from datetime import datetime

import numpy as np

from pointseg.data.s3dis import NUM_S3DIS_CLASSES, S3DIS_CLASSES, S3DIS_CLASSES_13

MODEL_CHOICES = ["PointNet", "PointNet++", "PointNet++MSG", "PointNeXt",
                 "PointNeXt-B", "PointNeXt-L", "DeepGraphCnn"]


def _add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", choices=MODEL_CHOICES, help="Name of the model to train.")
    p.add_argument("--data-dir", default="S3DIS_blocks")
    p.add_argument("--synthetic", action="store_true",
                   help="Generate a synthetic block dataset (no S3DIS needed).")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--lr-schedule", choices=["constant", "cosine", "warmup_cosine"],
                   default="constant",
                   help="constant reproduces the reference's fixed-LR Adam.")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--grad-clip", type=float, default=None,
                   help="Global-norm gradient clipping.")
    p.add_argument("--train-batch-size", type=int, default=8)
    p.add_argument("--test-batch-size", type=int, default=2)
    p.add_argument("--train-sampling", type=int, default=4096)
    p.add_argument("--test-sampling", type=int, default=None)
    p.add_argument("--test-pad-to", type=int, default=None,
                   help="Static pad size for unsampled test blocks.")
    p.add_argument("--test-areas", type=int, nargs="+", default=[6])
    p.add_argument("--test-pad-mode", choices=["repeat", "zero"],
                   default="repeat",
                   help="Static-pad filler for eval batches: 'repeat' "
                        "(in-distribution, default) or 'zero' (exact "
                        "reference semantics; distorts BN stats when "
                        "bucket padding is large).")
    p.add_argument("--num-workers", type=int, default=4,
                   help="Parallel host block readers (0 = serial).")
    p.add_argument("--device-store", choices=["auto", "flat", "compact", "host"],
                   default="auto",
                   help="With --device-data: force a store layout "
                        "instead of the budget-driven auto chain.")
    p.add_argument("--device-data", action="store_true",
                   help="Keep the whole train split resident in HBM and "
                        "sample blocks/points on device (zero per-step "
                        "host I/O; with-replacement point sampling).")
    p.add_argument("--pack-cache", default=None, metavar="DIR",
                   help="With --device-data: persist the packed device "
                        "store here, keyed by a dataset fingerprint. A "
                        "hit skips the raw block load and the pack "
                        "(~285 s host work at full S3DIS scale), so "
                        "restarts go straight to the upload. Implies "
                        "compact-first in auto layout (the compact "
                        "store is what gets cached; it samples "
                        "bit-identically at equal throughput).")
    p.add_argument("--scan-steps", type=int, default=1,
                   help="With --device-data: fuse K (sample -> train "
                        "step) iterations into one lax.scan program "
                        "per dispatch (same batches/rng as K=1; cuts "
                        "per-step host dispatch overhead by K).")
    p.add_argument("--accum-steps", type=int, default=1,
                   help="Gradient accumulation: K consecutive loader "
                        "batches -> ONE optimizer update (mean of "
                        "micro-batch grads; effective batch K*B at "
                        "single-batch peak HBM). Host loaders only; "
                        "mutually exclusive with --scan-steps.")
    p.add_argument("--log-interval", type=int, default=20)
    p.add_argument("--log-dir", default="saved_runs")
    p.add_argument("--model-dir", default="saved_models")
    p.add_argument("--resume", default=None, help="Checkpoint dir or file to resume from.")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true", help="Compute in bfloat16.")
    p.add_argument("--static-graph", action="store_true",
                   help="DGCNN models: compute the kNN graph once on "
                        "xyz and reuse it in every EdgeConv (about 20 "
                        "percent faster step; deviates from the "
                        "reference's per-layer feature-space graphs).")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard the batch over all devices (SPMD DP).")
    p.add_argument("--profile", default=None,
                   help="Capture a jax.profiler trace of the first train steps to this dir.")
    p.add_argument("--save-confusion", action="store_true",
                   help="Render a per-epoch confusion-matrix heatmap into the log dir.")


def cmd_train(args) -> int:
    import jax
    import jax.numpy as jnp

    from pointseg.data.datasets import create_block_dataloaders
    from pointseg.data import synthetic
    from pointseg.io.checkpoint import restore_train_state
    from pointseg.models import create_model
    from pointseg.runtime import is_oom_error, oom_advice, setup_runtime
    from pointseg.train.logging import MetricsLogger, save_records
    from pointseg.train.loop import train_model
    from pointseg.train.state import create_train_state

    setup_runtime()

    if args.synthetic and not os.path.exists(args.data_dir):
        print(f"Generating synthetic block dataset at {args.data_dir} ...")
        # rgb_u8 matches real S3DIS (integer 0-255 colors) and keeps the
        # dataset packable for the compact device store / --pack-cache
        synthetic.make_block_dataset(
            args.data_dir, rooms_per_area=2, points_per_room=20000,
            seed=args.seed, rgb_u8=True,
        )

    run_name = os.path.join(args.model, datetime.now().strftime("%Y-%m-%d_%H-%M-%S"))
    log_path = os.path.join(args.log_dir, run_name)
    ckpt_dir = os.path.join(args.model_dir, run_name)
    logger = MetricsLogger(log_path)

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model_kwargs = {}
    if getattr(args, "static_graph", False):
        if args.model not in ("DGCNN", "DeepGraphCnn"):
            raise SystemExit("--static-graph only applies to DGCNN models")
        model_kwargs["static_graph"] = True
    model = create_model(args.model, num_classes=NUM_S3DIS_CLASSES,
                         dtype=dtype, **model_kwargs)
    print(f"Starting training of model {args.model}.")

    train_loader, test_loader = create_block_dataloaders(
        data_dir=args.data_dir,
        test_areas=set(args.test_areas),
        train_batch_size=args.train_batch_size,
        test_batch_size=args.test_batch_size,
        train_sampling=args.train_sampling,
        test_sampling=args.test_sampling,
        test_pad_to=args.test_pad_to,
        test_buckets=None if args.test_pad_to else (1024, 2048, 4096, 8192, 16384, 32768, 65536),
        seed=args.seed,
        num_workers=args.num_workers,
        test_pad_mode=args.test_pad_mode,
    )
    if args.device_data:
        if args.accum_steps > 1:
            # fail before the (possibly multi-minute) store build: the
            # accumulation path host-stacks batches, which would add a
            # device->host round trip per micro-batch on a device loader
            raise SystemExit(
                "--accum-steps requires a host loader; drop "
                "--device-data or --accum-steps")
        # Swap the host train loader for the on-HBM sampling path
        # (pointseg/data/device.py); eval keeps the host loader — it
        # needs whole blocks, not samples.
        from pointseg.data.datasets import BlockDataset
        from pointseg.data.device import device_store_or_host_loader

        all_train_areas = {1, 2, 3, 4, 5, 6} - set(args.test_areas)
        raw_ds = BlockDataset(args.data_dir, all_train_areas, sampling=None,
                              seed=args.seed)
        if getattr(args, "pack_cache", None) and \
                getattr(args, "device_store", "auto") in ("flat", "host"):
            print(f"note: --pack-cache is ignored with --device-store "
                  f"{args.device_store} (only the compact store packs)")
        # policy chain: flat f32 store -> 16 B/point compact store ->
        # chunked host prefetcher, by HBM budget (device.py docstring)
        train_loader, data_mode = device_store_or_host_loader(
            raw_ds, args.train_batch_size, args.train_sampling,
            seed=args.seed, num_workers=max(args.num_workers, 4),
            layout=getattr(args, "device_store", "auto"),
            pack_cache=getattr(args, "pack_cache", None))
        if data_mode in ("device", "compact"):
            store = train_loader.store
            print(f"Device-resident train split ({data_mode}): "
                  f"{store.num_blocks} blocks, "
                  f"{store.nbytes / 1e6:.1f} MB on HBM.")
        else:
            why = getattr(train_loader, "policy_reason", "")
            if getattr(args, "device_store", "auto") == "host":
                print("Device store layout forced to host; using the "
                      "chunked host prefetcher.")
            else:
                print("Device store unavailable"
                      + (f" ({why})" if why else "")
                      + "; using the chunked host prefetcher.")
    all_areas = {1, 2, 3, 4, 5, 6}
    print(
        f"Initialized train dataloader with areas {all_areas - set(args.test_areas)}, "
        f"and test dataloader with areas {set(args.test_areas)}."
    )
    print(f"Using devices {jax.devices()}.")
    print("-" * 15)

    from pointseg.train.state import make_optimizer

    example = jnp.zeros((args.train_batch_size, args.train_sampling, 9), jnp.float32)
    steps_per_epoch = max(len(train_loader), 1)
    tx = make_optimizer(
        args.learning_rate,
        schedule=args.lr_schedule,
        total_steps=args.epochs * steps_per_epoch,
        warmup_steps=args.warmup_steps,
        grad_clip=args.grad_clip,
    )
    state = create_train_state(model, example, args.learning_rate, tx=tx, seed=args.seed)
    if args.resume:
        state = restore_train_state(args.resume, state)
        print(f"Resumed from step {int(state.step)}.")

    if args.data_parallel:
        # SPMD data parallelism: batch axis sharded over all devices,
        # params replicated; XLA inserts the grad all-reduce. Single
        # chip is the degenerate 1-device mesh. Batches must actually be
        # device_put with the batch sharding — sharding only the state
        # would leave every device processing the full batch.
        from pointseg.parallel import create_mesh, shard_batch, shard_state

        mesh = create_mesh()
        state = shard_state(mesh, state)
        n = len(mesh.devices.ravel())
        if args.train_batch_size % n != 0:
            raise SystemExit(
                f"--data-parallel needs train batch size divisible by "
                f"{n} devices, got {args.train_batch_size}"
            )

        class _ShardedLoader:
            def __init__(self, loader):
                self._loader = loader

            def __len__(self):
                return len(self._loader)

            def __iter__(self):
                for batch in self._loader:
                    yield shard_batch(mesh, batch)

        # eval runs with the replicated params and unsharded batches
        train_loader = _ShardedLoader(train_loader)
        print(f"Data-parallel over {n} device(s).")

    config = {k: v for k, v in vars(args).items() if not callable(v) and k != "func"}

    if args.profile:
        import jax.profiler

        jax.profiler.start_trace(args.profile)

    try:
        state, records = train_model(
            state,
            train_loader,
            test_loader,
            num_epochs=args.epochs,
            log_interval=args.log_interval,
            logger=logger,
            seed=args.seed,
            num_classes=NUM_S3DIS_CLASSES,
            ckpt_dir=ckpt_dir,
            config=config,
            confusion_dir=os.path.join(log_path, "confusion")
            if args.save_confusion else None,
            scan_steps=args.scan_steps,
            accum_steps=args.accum_steps,
        )
    except Exception as e:
        if is_oom_error(e):
            print(oom_advice(args.train_batch_size, args.train_sampling))
        raise

    if args.profile:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {args.profile}")

    save_records(log_path, "records", records)
    logger.close()
    print(f"Model checkpoints saved to: {ckpt_dir}.")
    print(f"View logs under: {log_path} (metrics.csv / metrics.jsonl / TensorBoard)")
    return 0


def cmd_prepare(args) -> int:
    from pointseg.data.blocks import preprocess_dataset
    from pointseg.data.prepare import precompute_chunk_index, prepare_s3dis, split_chunks

    stage = args.stage
    if stage in ("all", "raw"):
        prepare_s3dis(args.input_path, args.areas_path)
    if stage in ("all", "chunks"):
        split_chunks(args.areas_path, args.chunked_path, n_chunks=args.n_chunks)
    if stage in ("all", "index"):
        precompute_chunk_index(args.chunked_path, force_recompute=args.force)
    if stage in ("all", "blocks"):
        preprocess_dataset(args.chunked_path, args.blocks_path)
    return 0


def cmd_evaluate(args) -> int:
    import jax
    import jax.numpy as jnp

    from pointseg.data.datasets import create_block_dataloaders
    from pointseg.io.checkpoint import load_config, restore_train_state
    from pointseg.models import create_model
    from pointseg.runtime import setup_runtime
    from pointseg.train.loop import evaluate
    from pointseg.train.state import create_train_state

    setup_runtime()

    ckpt_dir = (
        args.model_path if os.path.isdir(args.model_path)
        else os.path.dirname(args.model_path)
    )
    config = load_config(ckpt_dir) or {}
    model_name = args.model or config.get("model", "PointNet++")
    num_classes = args.num_classes
    class_names = S3DIS_CLASSES[:num_classes]
    # params are f32 either way (flax dtype only selects compute dtype),
    # so checkpoints load regardless; follow the training run's setting
    # unless explicitly overridden
    use_bf16 = args.bf16 or bool(config.get("bf16"))
    extra = {}
    if config.get("static_graph") and model_name in ("DGCNN", "DeepGraphCnn"):
        # evaluate with the graph mode the model was trained in
        extra["static_graph"] = True
    model = create_model(model_name, num_classes=num_classes,
                        dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
                        **extra)

    sampling = args.sampling
    example = jnp.zeros((args.batch_size, sampling or 4096, 9), jnp.float32)
    state = create_train_state(model, example)
    state = restore_train_state(args.model_path, state)
    print(f"Loaded {model_name} from {args.model_path} (step {int(state.step)}).")

    if args.whole_rooms:
        # whole-room sliding-window evaluation over the chunked stack
        # (reference models/dgcnn/evaluate.py + utils.py:134-258)
        from pointseg.data.datasets import ChunkedRoomDataset, ListLoader
        from pointseg.utils.evaluation import evaluate_rooms

        ds = ChunkedRoomDataset(
            args.data_path, args.test_areas, require_index_file=False
        )
        loader = ListLoader(ds, batch_size=1)

        variables = {"params": state.params, "batch_stats": state.batch_stats}

        # rooms carry 6 features (xyz+rgb); models trained on 9-feature
        # blocks need the relative-coordinate augmentation. The window
        # buffer is zero-padded, so min/max must be length-masked or the
        # padding would drag the center toward the origin. The whole
        # pipeline (augment + model) is one jitted program per window
        # shape — un-jitted eager ops are pathologically slow on the
        # relayed TPU runtime (ADVICE.md round 1).
        from pointseg.train.loss import length_mask

        from pointseg.train.state import bn_batch_apply

        @jax.jit
        def forward9(points, lengths):
            p = jnp.asarray(points)
            m = length_mask(jnp.asarray(lengths), p.shape[1])[..., None]
            big = jnp.float32(1e30)
            vmin = jnp.min(jnp.where(m, p[..., :3], big), axis=1, keepdims=True)
            vmax = jnp.max(jnp.where(m, p[..., :3], -big), axis=1, keepdims=True)
            center = jnp.concatenate(
                [
                    vmin[..., 0:1] + 0.5,
                    vmin[..., 1:2] + 0.5,
                    (vmin[..., 2:3] + vmax[..., 2:3]) / 2,
                ],
                axis=-1,
            )
            p9 = jnp.concatenate([p, p[..., :3] - center], axis=-1)
            if args.bn_stats == "batch":
                return bn_batch_apply(model, variables, p9)
            return model.apply(variables, p9, train=False)

        results = evaluate_rooms(
            forward9,
            loader,
            class_names,
            window_size=args.window_size,
            overlap=args.overlap,
            stream=args.stream,
        )
        if args.save_results:
            with open(args.save_results, "w") as f:
                json.dump(results, f, indent=2)
            print(f"Results saved to {args.save_results}")
        return 0

    _, test_loader = create_block_dataloaders(
        data_dir=args.data_path,
        test_areas=set(args.test_areas),
        test_batch_size=args.batch_size,
        train_sampling=sampling or 4096,
        test_sampling=sampling,
        test_buckets=(1024, 2048, 4096, 8192, 16384, 32768, 65536),
        test_pad_mode=args.pad_mode,
    )
    step_fn = None
    if args.bn_stats == "batch":
        from pointseg.train.state import make_eval_step

        step_fn = make_eval_step(model, bn_stats="batch")
    results = evaluate(state, test_loader, num_classes=num_classes,
                       step_fn=step_fn)

    print("\n=== Evaluation results ===")
    print(f"Overall accuracy:    {100.0 * results['accuracy']:.2f}%")
    print(f"Mean class accuracy: {100.0 * results['mean_class_accuracy']:.2f}%")
    print(f"Mean IoU:            {100.0 * results['mean_iou']:.2f}%")
    print("Per-class accuracy / IoU:")
    for name, acc, iou in zip(
        class_names, results["class_accuracies"], results["ious"]
    ):
        print(f"  {name:<10s} {100.0 * float(acc):6.2f}%  {100.0 * float(iou):6.2f}%")

    if args.save_results:
        out = {
            "accuracy": results["accuracy"],
            "mean_class_accuracy": results["mean_class_accuracy"],
            "class_accuracies": {
                n: float(v)
                for n, v in zip(class_names, results["class_accuracies"])
            },
            "mean_iou": results["mean_iou"],
            "ious": {n: float(v) for n, v in zip(class_names, results["ious"])},
            "confusion": results["confusion"].tolist(),
        }
        with open(args.save_results, "w") as f:
            json.dump(out, f, indent=2)
        print(f"Results saved to {args.save_results}")
    return 0


def cmd_export(args) -> int:
    """Export a checkpoint's eval-mode forward as a StableHLO serving
    artifact (pointseg.io.export_aot; weights stay in the checkpoint)."""
    import jax.numpy as jnp

    from pointseg.io.checkpoint import load_config, restore_train_state
    from pointseg.io.export_aot import export_forward
    from pointseg.models import create_model
    from pointseg.runtime import setup_runtime
    from pointseg.train.state import create_train_state

    setup_runtime()
    ckpt_dir = (
        args.model_path if os.path.isdir(args.model_path)
        else os.path.dirname(args.model_path)
    )
    config = load_config(ckpt_dir) or {}
    model_name = args.model or config.get("model", "PointNet++")
    use_bf16 = args.bf16 or bool(config.get("bf16"))
    extra = {}
    if config.get("static_graph") and model_name in ("DGCNN", "DeepGraphCnn"):
        # export the graph mode the model was trained in
        extra["static_graph"] = True
    model = create_model(model_name, num_classes=args.num_classes,
                        dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
                        **extra)
    example = jnp.zeros((args.batch_size, args.npoints, 9), jnp.float32)
    state = create_train_state(model, example)
    state = restore_train_state(args.model_path, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    blob = export_forward(model, variables, example, platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"Exported {model_name} (B={args.batch_size}, N={args.npoints}, "
          f"platforms={platforms or 'default'}) -> {args.out} "
          f"({len(blob) / 1024:.0f} KB)")
    return 0


def cmd_doctor(args) -> int:
    """Environment/dispatch diagnostics.

    Answers the questions that page people at 3am: which backend will
    run, which kernel paths dispatch, is the native parser available,
    is the compile cache on — with a watchdog so a wedged accelerator
    runtime reports as such instead of hanging the terminal (the axon
    relay failure mode, CLAUDE.md)."""
    from pointseg.runtime import setup_runtime, watchdog_devices

    setup_runtime()
    import jax

    print(f"pointseg {__import__('pointseg').__version__}")
    print(f"jax {jax.__version__}")

    devices, err = watchdog_devices(probe_compute=True)
    if devices is None:
        print(f"devices: ERROR — {err}\n  (set JAX_PLATFORMS=cpu or "
              "POINTSEG_PLATFORM=cpu to work on CPU)")
        return 1
    print(f"devices: {[str(d) for d in devices]}")

    from pointseg.ops.dispatch import use_pallas, use_select2l
    from pointseg.ops.gather import scatter_strategy

    print(f"pallas kernels: {'ON' if use_pallas() else 'off (pure-JAX oracle)'}"
          f"  [POINTSEG_PALLAS={os.environ.get('POINTSEG_PALLAS', '<auto>')}]")
    print(f"two-level selection: {'ON' if use_select2l() else 'off'}"
          f"  [POINTSEG_SELECT2L={os.environ.get('POINTSEG_SELECT2L', '<default>')}]")
    print(f"gather-backward strategy: {scatter_strategy()}"
          f"  [POINTSEG_SCATTER={os.environ.get('POINTSEG_SCATTER', '<auto>')}]")
    print(f"ball-query filler mode: "
          f"{os.environ.get('POINTSEG_BQ_FILLER', 'repeat')}")

    from pointseg.data.native import get_lib

    print(f"native ETL parser: "
          f"{'available' if get_lib() is not None else 'unavailable (Python fallback)'}")
    print(f"compile cache: {jax.config.jax_compilation_cache_dir}")
    return 0


def cmd_import_torch(args) -> int:
    """Converts a reference PyTorch checkpoint into a pointseg one.

    Migration path for users of the reference framework: their trained
    ``model.state_dict()`` `.pt` files (reference train.py:88,
    models/dgcnn/train_model.py) become a pointseg checkpoint directory
    directly usable by `pointseg evaluate` / `--resume`. The conversion
    (pointseg/io/torch_import.py) is exact up to float reassociation;
    the same mapping backs the transferred-weights forward-equivalence
    tests in tests/test_reference_parity.py.
    """
    import jax
    import jax.numpy as jnp

    from pointseg.io.checkpoint import save_checkpoint
    from pointseg.io.torch_import import load_torch_checkpoint
    from pointseg.models import create_model
    from pointseg.runtime import setup_runtime
    from pointseg.train.state import create_train_state

    setup_runtime()

    model = create_model(args.model, num_classes=args.num_classes)
    example = jnp.zeros((2, args.num_points, 9), jnp.float32)
    state = create_train_state(model, example)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    converted = load_torch_checkpoint(args.torch_checkpoint, args.model, variables)
    state = state.replace(
        params=converted["params"],
        batch_stats=converted.get("batch_stats", {}),
    )
    config = {
        "model": args.model,
        "num_classes": args.num_classes,
        "imported_from": os.path.abspath(args.torch_checkpoint),
    }
    path = save_checkpoint(args.out_dir, state, step=0, config=config)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    print(f"Imported {args.model} ({n_params:,} params) from "
          f"{args.torch_checkpoint}\n  -> {path}")
    print(f"Evaluate it with: pointseg evaluate --model-path {args.out_dir} "
          f"--data-path <blocks> --num-classes {args.num_classes}")
    return 0


def cmd_benchmark(args) -> int:
    import jax
    import jax.numpy as jnp

    from pointseg.runtime import setup_runtime

    setup_runtime()

    from pointseg.models import create_model
    from pointseg.train.state import create_train_state, train_step
    from pointseg.utils.benchmark import benchmark_points_per_sec

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = create_model(args.model, num_classes=NUM_S3DIS_CLASSES, dtype=dtype)
    B, N = args.batch_size, args.num_points
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.normal(size=(B, N, 9)).astype(np.float32))
    labels = jnp.asarray(
        np.eye(NUM_S3DIS_CLASSES, dtype=np.uint8)[
            rng.integers(0, NUM_S3DIS_CLASSES, size=(B, N))
        ]
    )
    lengths = jnp.full((B,), N, jnp.int32)
    state = create_train_state(model, points, 1e-3)

    if args.mode == "train":
        def step(s):
            s, m = train_step(s, points, labels, lengths, jax.random.key(0))
            return s

        # donation-safe timing loop: thread the state; sync via a host
        # scalar fetch (block_until_ready can no-op on relayed runtimes)
        import time as _t

        def sync(s):
            jax.device_get(jax.tree.leaves(s.params)[0].ravel()[0])

        s = state
        for _ in range(args.warmup):
            s = step(s)
        sync(s)
        # The sync is itself a ~29-60 ms serial round trip on relayed
        # runtimes while step dispatches pipeline at device rate
        # (AB_SYNC_CHUNK_r05.json) — size chunks so the one
        # end-of-chunk fetch is <=5% of each chunk, else per-step time
        # silently inflates by sync/chunk.
        lat = []
        for _ in range(3):
            t0 = _t.perf_counter()
            sync(s)
            lat.append(_t.perf_counter() - t0)
        sync_s = float(np.median(lat))
        n = min(10, args.runs)
        t0 = _t.perf_counter()
        for _ in range(n):
            s = step(s)
        sync(s)
        from pointseg.utils.benchmark import pick_chunk

        chunk = pick_chunk(sync_s, (_t.perf_counter() - t0) / n,
                           pilot_n=n, lo=5)
        times = []
        done = 0
        while done < args.runs:
            n = min(chunk, args.runs - done)
            t0 = _t.perf_counter()
            for _ in range(n):
                s = step(s)
            sync(s)
            times.append((_t.perf_counter() - t0) / n)
            done += n
        mean = float(np.mean(times))
        stats = {
            "mean_s": mean,
            "std_s": float(np.std(times)),
            "min_s": float(np.min(times)),
            "max_s": float(np.max(times)),
            "fps": 1.0 / mean,
            "points_per_sec": B * N / mean,
            "chunk": chunk,
            "sync_ms": round(sync_s * 1e3, 3),
        }
    else:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        stats = benchmark_points_per_sec(
            fwd, variables, points,
            points_per_call=B * N, num_runs=args.runs, warmup=args.warmup,
        )

    print(json.dumps({"model": args.model, "mode": args.mode, "B": B, "N": N, **stats}))
    return 0


def cmd_train_legacy(args) -> int:
    import jax.numpy as jnp

    from pointseg.runtime import setup_runtime

    setup_runtime()

    from pointseg.data.datasets import create_chunked_dataloaders
    from pointseg.models import create_model
    from pointseg.train.legacy import train_model as legacy_train
    from pointseg.train.state import create_train_state

    mapping = S3DIS_CLASSES_13 if args.num_classes == 13 else S3DIS_CLASSES
    train_loader, test_loader = create_chunked_dataloaders(
        args.data_dir,
        batch_size=args.batch_size,
        require_index_file=not args.no_index,
    )
    if args.test_on_train:
        test_loader = train_loader  # the reference's small-excerpt mode
    # chunked rooms carry 6 features (xyz+rgb), not the block stack's 9
    kwargs = {"in_dim": 6} if args.model == "PointNet" else {}
    model = create_model(args.model, num_classes=len(mapping), **kwargs)
    example = jnp.zeros((args.batch_size, min(args.cut or 1024, 4096), 6), jnp.float32)
    state = create_train_state(model, example, args.learning_rate, seed=args.seed)
    state, records = legacy_train(
        state,
        train_loader,
        test_loader,
        mapping,
        epochs=args.epochs,
        print_records=True,
        records_dir=args.records_dir,
        records_filename=args.records_filename,
        cut=args.cut,
        sampling=args.sampling,
        seed=args.seed,
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="pointseg", description="TPU-native 3D semantic segmentation framework."
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train", help="Train a model on block data.")
    _add_train_args(p)
    p.set_defaults(func=cmd_train)

    p = sub.add_parser("prepare", help="Offline ETL: raw S3DIS -> blocks.")
    p.add_argument("--stage", choices=["all", "raw", "chunks", "index", "blocks"],
                   default="all")
    p.add_argument("--input-path", default="data/s3dis")
    p.add_argument("--areas-path", default="data")
    p.add_argument("--chunked-path", default="data_chunked")
    p.add_argument("--blocks-path", default="S3DIS_blocks")
    p.add_argument("--n-chunks", type=int, default=10)
    p.add_argument("--force", action="store_true")
    p.set_defaults(func=cmd_prepare)

    p = sub.add_parser("evaluate", help="Evaluate a checkpoint.")
    p.add_argument("--model-path", required=True)
    p.add_argument("--data-path", required=True)
    p.add_argument("--model", default=None, choices=MODEL_CHOICES + [None])
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--sampling", type=int, default=None)
    p.add_argument("--test-areas", type=int, nargs="+", default=[6])
    p.add_argument("--save-results", default=None)
    p.add_argument("--num-classes", type=int, default=14, choices=[13, 14],
                   help="13 for legacy-stack checkpoints (reference "
                        "models/dgcnn/evaluate.py is 13-class).")
    p.add_argument("--pad-mode", choices=["repeat", "zero"], default="repeat",
                   help="Eval-batch padding filler (see train --test-pad-mode).")
    p.add_argument("--whole-rooms", action="store_true",
                   help="Whole-room sliding-window eval over chunked data.")
    p.add_argument("--window-size", type=int, default=4096)
    p.add_argument("--overlap", type=int, default=512)
    p.add_argument("--stream", choices=["device", "host"], default="device",
                   help="whole-room windows: 'device' scans them inside "
                        "one jitted program with the room resident on "
                        "the chip (one transfer each way per room); "
                        "'host' is the reference-shaped per-window loop. "
                        "In f32 the two are bit-identical; under --bf16 "
                        "expect ~0.1-0.2%% argmax flips at near-uniform "
                        "confidence (different reduction order breaks "
                        "ties differently — ROOMS_BENCH_r03.json)")
    p.add_argument("--bf16", action="store_true",
                   help="Compute in bfloat16 (params stay f32, so any "
                        "checkpoint loads either way). Defaults to the "
                        "training run's --bf16 setting from the config "
                        "sidecar.")
    p.add_argument("--bn-stats", choices=["running", "batch"], default="running",
                   help="BatchNorm statistics at eval time: 'running' "
                        "(checkpoint averages — reference parity) or 'batch' "
                        "(test-time adaptation: normalize with the eval "
                        "batch's own statistics; robust to train/eval "
                        "point-density shift, see train/state.py::"
                        "bn_adapted_model).")
    p.set_defaults(func=cmd_evaluate)

    p = sub.add_parser(
        "export",
        help="Export a checkpoint's forward as a StableHLO serving artifact.",
    )
    p.add_argument("model_path", help="Checkpoint file or directory.")
    p.add_argument("--out", required=True, help="Output .stablehlo path.")
    p.add_argument("--model", default=None, help="Model name (default: "
                   "from the checkpoint's config sidecar).")
    p.add_argument("--num-classes", type=int, default=NUM_S3DIS_CLASSES)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--npoints", type=int, default=4096,
                   help="Serving shape: export one artifact per bucket.")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--platforms", default=None,
                   help="Comma-separated lowering platforms, e.g. "
                        "'cpu,tpu' (default: current backend).")
    p.set_defaults(func=cmd_export)

    p = sub.add_parser("doctor", help="Environment/dispatch diagnostics.")
    p.set_defaults(func=cmd_doctor)

    p = sub.add_parser(
        "import-torch",
        help="Convert a reference PyTorch .pt checkpoint to a pointseg one.",
    )
    p.add_argument("--torch-checkpoint", required=True,
                   help="Reference .pt file (a state_dict or full-model "
                        "pickle; requires torch at runtime).")
    p.add_argument("--model", required=True,
                   choices=["PointNet", "PointNet++", "PointNeXt", "DGCNN",
                            "DeepGraphCnn"],
                   help="Model family the checkpoint belongs to "
                        "(DeepGraphCnn = the color-branch DGCNN of the "
                        "main CLI; DGCNN = the plain 13-class variant).")
    p.add_argument("--out-dir", required=True,
                   help="Destination checkpoint directory (written with a "
                        "config.json sidecar, so `pointseg evaluate "
                        "--model-path <out-dir>` discovers the model).")
    p.add_argument("--num-classes", type=int, default=14, choices=[13, 14])
    p.add_argument("--num-points", type=int, default=4096,
                   help="Example input length used only to initialize the "
                        "parameter structure (any value works; shapes are "
                        "point-count independent).")
    p.set_defaults(func=cmd_import_torch)

    p = sub.add_parser("benchmark", help="Micro-benchmark a model.")
    p.add_argument("--model", default="PointNet++", choices=MODEL_CHOICES)
    p.add_argument("--mode", choices=["train", "inference"], default="train")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--runs", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--bf16", action="store_true")
    p.set_defaults(func=cmd_benchmark)

    p = sub.add_parser("train-legacy", help="Legacy/chunked-stack trainer.")
    p.add_argument("model", choices=MODEL_CHOICES)
    p.add_argument("--data-dir", default="test_data")
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--cut", type=int, default=1000)
    p.add_argument("--sampling", type=float, default=None)
    p.add_argument("--num-classes", type=int, default=13, choices=[13, 14])
    p.add_argument("--no-index", action="store_true")
    p.add_argument("--test-on-train", action="store_true")
    p.add_argument("--records-dir", default="saved_training/history")
    p.add_argument("--records-filename", default="records")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(func=cmd_train_legacy)

    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
