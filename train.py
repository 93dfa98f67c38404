"""IterMVS training driver — CLI-compatible with the reference train.py.

TPU-native training: one jitted train step (forward + loss + global-norm
clip + Adam) with the batch axis sharded over a 1-D device mesh (GSPMD
inserts the gradient all-reduce over ICI); per-epoch MultiStep LR,
TensorBoard scalars every --summary_freq steps, Orbax checkpoints every
--save_freq epochs, latest-epoch resume, and a full validation pass per
epoch (reference recipe: train.py:123-191).
"""
from __future__ import annotations

import functools
import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from itermvs_tpu.data import find_dataset_def
from itermvs_tpu.data.loader import DataLoader
from itermvs_tpu.engine.checkpoint import (
    latest_checkpoint, restore_checkpoint, restore_weights_only, save_checkpoint,
)
from itermvs_tpu.engine.metrics import DictAverageMeter
from itermvs_tpu.engine.tb_writer import SummaryWriter
from itermvs_tpu.engine.train_loop import (
    create_train_state, lr_for_epoch, make_optimizer, make_train_step,
    make_val_step,
)
from itermvs_tpu.models import Pipeline
from itermvs_tpu.parallel.mesh import initialize_distributed, make_mesh, shard_batch
from itermvs_tpu.utils import enable_persistent_cache, respect_jax_platforms_env

respect_jax_platforms_env()
enable_persistent_cache()

parser = argparse.ArgumentParser(
    description="IterMVS for high-resolution multi-view stereo")
parser.add_argument("--mode", default="train", help="train or val",
                    choices=["train", "val"])
parser.add_argument("--model", default="IterMVS", help="select model")
parser.add_argument("--dataset", default="dtu_yao", help="select dataset")
parser.add_argument("--trainpath", help="train datapath")
parser.add_argument("--valpath", help="validation datapath")
parser.add_argument("--trainlist", help="train list")
parser.add_argument("--vallist", help="validation list")
parser.add_argument("--epochs", type=int, default=16, help="number of epochs to train")
parser.add_argument("--lr", type=float, default=0.001, help="learning rate")
parser.add_argument("--lrepochs", type=str, default="4,8,12:2",
                    help="epoch ids to downscale lr and the downscale rate")
parser.add_argument("--wd", type=float, default=0.0, help="weight decay")
parser.add_argument("--batch_size", type=int, default=4, help="train batch size")
parser.add_argument("--loadckpt", default=None, help="load a specific checkpoint")
parser.add_argument("--logdir", default="./checkpoints",
                    help="the directory to save checkpoints/logs")
parser.add_argument("--resume", action="store_true", help="continue to train the model")
parser.add_argument("--regress", action="store_true",
                    help="train the regression and confidence")
parser.add_argument("--small_image", action="store_true",
                    help="train with small input as 640x512, otherwise train with 1280x1024")
parser.add_argument("--summary_freq", type=int, default=20,
                    help="print and summary frequency")
parser.add_argument("--save_freq", type=int, default=1, help="save checkpoint frequency")
parser.add_argument("--save_step_freq", type=int, default=0,
                    help="additionally checkpoint every N train steps "
                         "(0 = off); resume continues mid-epoch on the "
                         "exact next batch")
parser.add_argument("--seed", type=int, default=1, metavar="S", help="random seed")
parser.add_argument("--iteration", type=int, default=4, help="num of iteration of GRU")
parser.add_argument("--precision", default="float32",
                    choices=["float32", "bfloat16"],
                    help="training compute precision: float32 = reference "
                         "parity recipe; bfloat16 runs convs/features/warp "
                         "tables on the MXU fast path (loss, heads, geometry "
                         "and BatchNorm statistics stay float32)")
parser.add_argument("--debug_nans", action="store_true",
                    help="abort with a traceback on the first NaN produced "
                         "on device (jax_debug_nans)")
parser.add_argument("--distributed", default="auto",
                    choices=["auto", "on", "off"],
                    help="multi-host jax.distributed init: auto = detect a "
                         "launcher/coordinator environment; on = initialize "
                         "or fail loudly; off = never initialize")
parser.add_argument("--loader_processes", type=int, default=-1,
                    help="decode worker PROCESSES for the input pipeline "
                         "(the reference's num_workers=4, train.py:89-90). "
                         "-1 = auto: min(4, cpu_count-1) when the host has "
                         ">1 core, else 0 (threaded decode; a single core "
                         "gains nothing from process fan-out)")


def pad_batch(sample, target: int):
    """Pad a short batch to `target` samples by repeating the last sample
    with its validity masks zeroed.

    Zero-mask padding is metric-exact, not just shape-safe: full_loss
    normalizes every term by the total mask count (models/losses.py:
    _masked_mean) and depth_metrics averages per-image values only over
    images with any valid pixels (engine/metrics.py:_batch_mean), so
    padded samples contribute exactly nothing. Mirrors eval.py's
    partial-batch padding for the sharded inference path."""
    n = int(np.asarray(sample["depth_min"]).shape[0])
    if n >= target:
        return sample, n

    def pad(x, zero=False):
        x = np.asarray(x)
        tail = np.repeat(x[-1:], target - n, axis=0)
        if zero:
            tail = np.zeros_like(tail)
        return np.concatenate([x, tail], axis=0)

    out = dict(sample)
    for key in ("imgs", "proj_matrices", "depth"):
        out[key] = {k: pad(v) for k, v in sample[key].items()}
    out["mask"] = {k: pad(v, zero=True) for k, v in sample["mask"].items()}
    out["depth_min"] = pad(sample["depth_min"])
    out["depth_max"] = pad(sample["depth_max"])
    return out, n


def to_device_batch(sample, mesh):
    batch = {
        "imgs": sample["imgs"],
        "proj_matrices": sample["proj_matrices"],
        "depth": sample["depth"],
        "mask": sample["mask"],
        "depth_min": sample["depth_min"],
        "depth_max": sample["depth_max"],
    }
    if mesh is not None:
        return shard_batch(batch, mesh)
    return jax.device_put(batch)


def main():
    args = parser.parse_args()
    # Multi-host DCN init (no-op single-process): must run before any
    # backend use so the global mesh spans all hosts' devices.
    initialize_distributed(args.distributed)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.resume:
        assert args.mode == "train"
        assert args.loadckpt is None
    if args.valpath is None:
        args.valpath = args.trainpath

    np.random.seed(args.seed)

    print("argv:", sys.argv[1:])
    for k, v in sorted(vars(args).items()):
        print(f"{k}: {v}")

    # TB writing happens on host 0 only; other processes still train and
    # print, but never touch the logdir (ref train.py:78 has one host).
    logger = None
    if args.mode == "train" and jax.process_index() == 0:
        os.makedirs(args.logdir, exist_ok=True)
        print("creating new summary file")
        logger = SummaryWriter(args.logdir)

    MVSDataset = find_dataset_def(args.dataset)
    train_dataset = MVSDataset(args.trainpath, args.trainlist, "train", 5,
                               robust_train=True, seed=args.seed)
    val_dataset = MVSDataset(args.valpath, args.vallist, "val", 5,
                             robust_train=False, seed=args.seed)
    # Under a multi-host launch each process loads only its slice of the
    # global batch; shard_batch assembles the global array from the
    # process-local shards.
    pidx, pcount = jax.process_index(), jax.process_count()
    loader_procs = args.loader_processes
    if loader_procs < 0:
        ncpu = os.cpu_count() or 1
        loader_procs = min(4, ncpu - 1) if ncpu > 1 else 0
    train_loader = DataLoader(train_dataset, args.batch_size, shuffle=True,
                              num_workers=4, drop_last=True, seed=args.seed,
                              process_index=pidx, process_count=pcount,
                              worker_processes=loader_procs)
    val_loader = DataLoader(val_dataset, args.batch_size, shuffle=False,
                            num_workers=4, drop_last=False,
                            process_index=pidx, process_count=pcount,
                            worker_processes=loader_procs)

    # Data-parallel mesh when the batch divides the device count.
    n_dev = jax.device_count()
    mesh = make_mesh() if (n_dev > 1 and args.batch_size % n_dev == 0) else None
    if mesh is not None:
        print(f"data-parallel over {n_dev} devices")

    model = Pipeline(iteration=args.iteration, test=False,
                     dtype=jnp.dtype(args.precision))
    tx = make_optimizer(args.wd)

    sample0 = train_dataset[0]
    init_batch = {
        k: jax.tree.map(lambda x: jnp.asarray(x)[None], sample0[k])
        for k in ("imgs", "proj_matrices")
    }
    # Jit the init: run eagerly it executes thousands of tiny ops one by
    # one (minutes over a remote-TPU link); jitted it is one compiled
    # program that the persistent cache then makes a one-time cost.
    init_fn = jax.jit(functools.partial(model.init, train=False))
    variables = init_fn(
        jax.random.PRNGKey(args.seed), init_batch["imgs"],
        init_batch["proj_matrices"], jnp.asarray([sample0["depth_min"]]),
        jnp.asarray([sample0["depth_max"]]))
    state = create_train_state(variables, tx)
    num_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"Number of model parameters: {num_params}")

    start_epoch = 0
    skip_batches = 0
    if (args.mode == "train" and args.resume) or (args.mode == "val" and not args.loadckpt):
        ckpt = latest_checkpoint(args.logdir)
        assert ckpt is not None, f"no checkpoint to resume in {args.logdir}"
        print("resuming", ckpt)
        state, epoch, step = restore_checkpoint(ckpt, state)
        if step is None:
            start_epoch = epoch + 1
        else:  # mid-epoch: re-enter `epoch` and skip its finished batches
            start_epoch = epoch
            skip_batches = step
    elif args.loadckpt:
        print(f"loading model {args.loadckpt}")
        state = restore_weights_only(args.loadckpt, state)
    print(f"start at epoch {start_epoch}"
          + (f" (skipping {skip_batches} batches)" if skip_batches else ""))

    train_step = make_train_step(model, tx, regress=args.regress,
                                 num_iters=args.iteration, mesh=mesh)
    val_step = make_val_step(model, regress=args.regress,
                             num_iters=args.iteration, mesh=mesh)

    @jax.jit
    def image_forward(params, batch_stats, imgs, projs, dmin, dmax):
        """Eval-mode forward for TB image summaries (ref train.py:139-143)."""
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          imgs, projs, dmin, dmax, train=False)
        return out["depths_upsampled"][0], out["confidence_upsampled"]

    def log_images(sample, step_no):
        """TB image summaries from the first host-local sample.

        Runs entirely host-local (batch-1 forward on one local device,
        inputs taken from the numpy sample before sharding) so it is
        multi-host safe: the globally-sharded training batch is never
        np.asarray'd, and only process 0 calls this (logger gating).
        """
        local = jax.local_devices()[0]
        params = jax.device_put(jax.device_get(state.params), local)
        bstats = jax.device_put(jax.device_get(state.batch_stats), local)
        one = lambda tree: jax.tree.map(lambda x: jnp.asarray(x[:1]), tree)
        depth_est, confidence = image_forward(
            params, bstats, one(sample["imgs"]), one(sample["proj_matrices"]),
            one(sample["depth_min"]), one(sample["depth_max"]))
        depth_est = np.asarray(depth_est)[..., 0]
        depth_gt = np.asarray(sample["depth"]["level_0"])[:1, ..., 0]
        mask = np.asarray(sample["mask"]["level_0"])[:1, ..., 0]
        logger.save_images("train", {
            "depth_est": depth_est * mask,
            "depth_gt": depth_gt,
            "ref_img": np.asarray(sample["imgs"]["level_0"])[:1, 0],
            "mask": mask,
            "errormap": np.abs(depth_est - depth_gt) * mask,
            "confidence": np.asarray(confidence)[..., 0],
        }, step_no)

    def run_validation(epoch_idx, global_step):
        meter = DictAverageMeter()

        def drain(batch_idx, device_scalars):
            # float() is the device sync point — by the time we block
            # here the NEXT batch's val_step is already dispatched, so
            # the device computes through the fetch (same one-deep
            # pipeline as eval.py's dispatch/finalize).
            scalars = {k: float(v) for k, v in device_scalars.items()}
            meter.update(scalars)
            if batch_idx % 100 == 0:
                print(f"Epoch {epoch_idx}/{args.epochs}, "
                      f"Iter {batch_idx}/{len(val_loader)}, "
                      f"test loss = {scalars['loss']:.3f}")

        pending = None
        for batch_idx, sample in enumerate(val_loader):
            # The final batch can be short (drop_last=False); pad it to
            # the full batch size with mask-zeroed samples so the batch
            # axis still divides the mesh (and the compiled signature is
            # reused). Zero-mask padding contributes exactly nothing to
            # loss or metrics (see pad_batch).
            sample, _ = pad_batch(sample, args.batch_size)
            batch = to_device_batch(sample, mesh)
            launched = val_step(state.params, state.batch_stats, batch)
            if pending is not None:
                drain(*pending)
            pending = (batch_idx, launched)
        if pending is not None:
            drain(*pending)
        means = meter.mean()
        if logger is not None:
            logger.save_scalars("fulltest", means, global_step)
        print("avg_test_scalars:", means)
        return means

    if args.mode == "val":
        run_validation(start_epoch, 0)
        return

    for epoch_idx in range(start_epoch, args.epochs):
        print(f"Epoch {epoch_idx}:")
        lr = lr_for_epoch(args.lr, epoch_idx, args.lrepochs)
        global_step = len(train_loader) * epoch_idx

        # Pin the shuffle order to the true epoch index (so resumed runs
        # regenerate the same batch sequence) and skip already-trained
        # batches when resuming from a step checkpoint.
        train_loader.set_epoch(epoch_idx, skip_batches)
        first_batch = skip_batches
        skip_batches = 0

        for batch_idx, sample in enumerate(train_loader, start=first_batch):
            start = time.time()
            step_no = len(train_loader) * epoch_idx + batch_idx
            batch = to_device_batch(sample, mesh)
            state, scalars = train_step(state, batch, jnp.float32(lr))
            if logger is not None and step_no % (50 * args.summary_freq) == 0:
                log_images(sample, step_no)
            do_summary = step_no % args.summary_freq == 0
            if do_summary:
                scalars = {k: float(v) for k, v in scalars.items()}
                if logger is not None:
                    logger.save_scalars("train", scalars, step_no)
                print(f"Epoch {epoch_idx}/{args.epochs}, "
                      f"Iter {batch_idx}/{len(train_loader)}, "
                      f"lr {lr:.6f}, train loss = {scalars['loss']:.3f}, "
                      f"time = {time.time() - start:.3f}")
            if (args.save_step_freq > 0
                    and (batch_idx + 1) % args.save_step_freq == 0
                    and batch_idx + 1 < len(train_loader)):
                path = save_checkpoint(args.logdir, epoch_idx, state,
                                       step=batch_idx + 1)
                print("saved", path)

        if (epoch_idx + 1) % args.save_freq == 0:
            path = save_checkpoint(args.logdir, epoch_idx, state)
            print("saved", path)

        run_validation(epoch_idx, global_step)


if __name__ == "__main__":
    main()
