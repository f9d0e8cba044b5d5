"""Training-loop drivers for every workload.

These are the runnable counterparts of the reference's entry points
(SURVEY.md §1): epoch-driven loops for VAE-GAN / VAE / DCGAN / WGAN /
diffusion (vaegan_code.py:55, main_vae.py:96, gan_code.py:187/289,
train_diffusion.py:110) and iteration-driven loops for the Glow models
(nf_code.py:577, flow_eeg.py:372). Shared responsibilities:

* device prefetch of uint8 batches (replaces DataLoader workers/pin_memory),
* per-epoch validation with SSIM / PSNR / MSE (+ IS / FID when a feature
  extractor is configured),
* orbax checkpointing of the FULL state (resumable — the reference only
  ever saves, SURVEY.md §5),
* artifact dumps: fixed-noise sample grids, noisy/clean/recon panels, loss
  curves, npz/jsonl metric logs,
* optional jax.profiler trace of a step window + per-step timing,
* deterministic RNG threading from a single seed.

Loops accept ``max_steps`` / epoch overrides so smoke tests and benchmarks
reuse the exact production code path.
"""
from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vgd_tpu.core.config import (DiffusionConfig, GANConfig, GlowConfig,
                                 GlowEEGConfig, VAEConfig, VAEGANConfig)
from vgd_tpu.core.rng import seed_all
from vgd_tpu.data.celeba import make_image_datasets
from vgd_tpu.data.eeg import EEGDataset, eeg_batches
from vgd_tpu.eval.metrics import MetricAccumulator, psnr, mse_metric, ssim
from vgd_tpu.io.artifacts import (MetricLog, save_grid, save_loss_curves,
                                  save_triplets)
from vgd_tpu.io.checkpoint import Checkpointer
from vgd_tpu.ops.image import signed_to_unit, to_signed
from vgd_tpu.utils.prefetch import device_prefetch


class _Profiler:
    """jax.profiler trace over a configured step window (SURVEY.md §5)."""

    def __init__(self, run_cfg):
        self.dir = run_cfg.profile_dir
        if self.dir and jax.process_index() != 0:
            self.dir = None   # one trace per pod, not one per host
        self.start_step, self.stop_step = run_cfg.profile_steps
        self.active = False

    def step(self, i: int):
        if not self.dir:
            return
        if i == self.start_step and not self.active:
            jax.profiler.start_trace(self.dir)
            self.active = True
        elif i == self.stop_step and self.active:
            jax.profiler.stop_trace()
            self.active = False

    # Scan-path tracing: the epoch-scan loops dispatch whole compiled chunks
    # (many steps per dispatch), so the per-step hook above never fires.
    # Instead, trace every chunk that overlaps [start_step, stop_step).
    def chunk_begin(self, lo: int, hi: int):
        """Call before dispatching a chunk covering global steps [lo, hi)."""
        if not self.dir or self.active:
            return
        if lo < self.stop_step and hi > self.start_step:
            jax.profiler.start_trace(self.dir)
            self.active = True

    def chunk_end(self, hi: int, sync=None):
        """Call after the chunk; ``sync`` (e.g. the new state) is blocked on
        before stopping so the trace contains the device execution — only
        when a trace is live, preserving the staging overlap otherwise."""
        if self.active and hi >= self.stop_step:
            if sync is not None:
                jax.block_until_ready(sync)
            jax.profiler.stop_trace()
            self.active = False

    def close(self):
        if self.active:
            jax.profiler.stop_trace()
            self.active = False


def _setup(cfg_run):
    if getattr(cfg_run, "multihost", False):
        # TPU pods: auto-detects coordinator address / process count from
        # the pod environment; makes jax.devices() span all hosts so
        # _dp_mesh's mesh covers the slice with no further changes.
        # NOTE: the host-side loaders are seeded identically on every
        # process, so all hosts stage the SAME global batch (the mesh shards
        # it across the pod's devices); the global batch size is
        # cfg.data.batch_size regardless of host count. Artifact writes
        # (MetricLog files, grids, profiler traces) are gated to process 0
        # in io/artifacts.py; orbax saves run on all processes.
        import jax.distributed
        kw = {}
        addr = os.environ.get("VGD_COORDINATOR")
        if addr:
            # explicit-coordinator mode for clusters without TPU-pod
            # auto-detection (and for the multi-process CPU test,
            # tests/test_multihost.py): VGD_COORDINATOR=host:port,
            # VGD_NUM_PROCESSES, VGD_PROCESS_ID
            kw = dict(coordinator_address=addr,
                      num_processes=int(os.environ["VGD_NUM_PROCESSES"]),
                      process_id=int(os.environ["VGD_PROCESS_ID"]))
            try:
                # cross-process collectives on the CPU backend need gloo
                # (TPU pods ride ICI natively; harmless there)
                jax.config.update("jax_cpu_collectives_implementation",
                                  "gloo")
            except Exception:
                pass
        try:
            jax.distributed.initialize(**kw)
        except Exception as e:  # already initialised / single host
            print(f"[setup] jax.distributed.initialize skipped: {e}")
    if cfg_run.debug_nans:
        jax.config.update("jax_debug_nans", True)
    try:
        # persistent XLA compilation cache: repeat CLI invocations skip the
        # 20-60 s step compiles
        cache_dir = os.path.expanduser("~/.cache/vgd_tpu_xla")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    os.makedirs(cfg_run.out_dir, exist_ok=True)
    return seed_all(cfg_run.seed, impl=getattr(cfg_run, "prng_impl", None))


def _dp_mesh(cfg_run, batch_size, model_consumer: Optional[str] = None):
    """Data-parallel mesh for the loop drivers (RunConfig.mesh): used when
    more than one device is visible and the batch divides the ``data`` axis
    evenly; otherwise the loops keep single-device semantics unchanged.
    Params replicate; the jitted steps are written against global logical
    shapes, so XLA inserts the gradient all-reduce and global-BatchNorm
    collectives (SURVEY.md §2c) without step-code changes.

    ``model_consumer`` names the subsystem that consumes a model axis
    ("tp": Glow coupling-filter sharding; "sp": UNet ring attention).
    Families with no consumer reject ``mesh.model > 1`` instead of silently
    replicating all compute across the model axis (every chip would run the
    full batch shard with zero speedup)."""
    if cfg_run.mesh.model > 1 and model_consumer is None:
        raise ValueError(
            f"--mesh-model {cfg_run.mesh.model} has no effect for this "
            "family: its parameters replicate, so a model axis duplicates "
            "all compute without speedup. Model-axis consumers are 'glow' / "
            "'glow-eeg' (tensor-parallel coupling filters) and 'diffusion' "
            "(ring-attention sequence parallelism); use --mesh-data for "
            "data parallelism here.")
    if jax.device_count() == 1:
        return None
    from vgd_tpu.parallel.mesh import DATA_AXIS, build_mesh
    try:
        mesh = build_mesh(cfg_run.mesh.data, cfg_run.mesh.model)
    except ValueError:
        return None
    if batch_size % mesh.shape[DATA_AXIS] != 0:
        return None
    return mesh


def _dp_state(mesh, state):
    """Replicate the train state across the mesh (no-op without one)."""
    if mesh is None:
        return state
    from vgd_tpu.parallel.mesh import shard_tree_replicated
    return shard_tree_replicated(mesh, state)


def _glow_state_placement(mesh, state, cfg):
    """Glow state placement: replicated for DP meshes; with ``model > 1``
    the coupling hidden-filter dim (the 512-wide layers, where the
    memory/FLOPs live) is sharded over the model axis and the jitted step
    runs DPxTP via jit sharding propagation (parallel/tensor_parallel.py)."""
    if mesh is None:
        return state
    from vgd_tpu.parallel.mesh import MODEL_AXIS
    if mesh.shape[MODEL_AXIS] <= 1:
        return _dp_state(mesh, state)
    if getattr(cfg, "pp_stages", 0) > 0:
        # PP: the model axis hosts pipeline STAGES — params stay replicated
        # (each stage slices its flows inside shard_map), no filter sharding
        return _dp_state(mesh, state)
    if getattr(cfg, "fused_coupling", False) or \
            getattr(cfg, "flow_stack", False):
        raise ValueError(
            "--mesh-model > 1 is incompatible with --fused-coupling/"
            "--flow-stack: a Pallas coupling kernel cannot be "
            "auto-partitioned over the filter axis (XLA shards only its "
            "batch grid). Drop one of the flags.")
    from vgd_tpu.parallel.tensor_parallel import shard_glow_state
    return shard_glow_state(mesh, state, cfg.filter_size)


def _dp_sharding(mesh, ndim=4, stacked=False):
    """NamedSharding for batch arrays: batch axis over ``data`` (axis 1 for
    stacked (n_steps, B, ...) epoch-scan chunks). None without a mesh."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vgd_tpu.parallel.mesh import DATA_AXIS
    spec = (P(None, DATA_AXIS, *([None] * (ndim - 2))) if stacked
            else P(DATA_AXIS, *([None] * (ndim - 1))))
    return NamedSharding(mesh, spec)


def _dp_put(mesh, ndim=4, stacked=False):
    """arr -> device array: per-shard H2D placement under a mesh (each
    device receives only its batch shard), plain jnp.asarray otherwise.

    Multi-host meshes (sharding not fully addressable from this process):
    every process stages the SAME seeded global batch (loop.py:_setup note),
    and the global array is assembled from each device's addressable shard
    slice — device_put cannot place to devices this process doesn't own."""
    sh = _dp_sharding(mesh, ndim, stacked)
    if sh is None:
        return jnp.asarray

    def put(arr):
        arr = np.asarray(arr)
        if sh.is_fully_addressable:
            return jax.device_put(arr, sh)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])
    return put


def _epoch_metrics_header(log, out_dir, prefix=""):
    save_loss_curves(log.curves(), os.path.join(out_dir,
                                                f"{prefix}losses.jpg"))
    log.save()


# streaming epoch scan: host-stage at most this many bytes of uint8 batches
# per compiled scan chunk (one chunk in flight + one being staged, so peak
# extra host memory is ~2 chunks instead of a full second copy of the epoch)
SCAN_CHUNK_BYTES = 256 * 1024 ** 2


def _stack_next(batch_iter, n: int):
    """Stack up to n batches from the iterator; None when exhausted."""
    import itertools
    buf = list(itertools.islice(batch_iter, n))
    if not buf:
        return None
    return np.stack(buf)


def _chunk_steps(batch_size: int, img_shape, steps_per_epoch: int) -> int:
    """Steps per compiled scan chunk: under the SCAN_CHUNK_BYTES budget AND
    at most a quarter of the epoch, so there are >= ~4 chunks per epoch —
    with a single whole-epoch chunk the host staging of the NEXT epoch's
    data serializes behind the device (no overlap), measurably losing to
    per-step prefetch at 64px (BASELINE.md round-4 epoch-scan A/B)."""
    batch_bytes = batch_size * int(np.prod(img_shape))
    budget = SCAN_CHUNK_BYTES // max(batch_bytes, 1)
    quarter = -(-steps_per_epoch // 4)   # ceil
    return max(1, min(steps_per_epoch, budget, quarter))


def _stream_epoch_scan(epoch_fn, state, train_iter, steps_per_epoch,
                       chunk_steps, key, epoch, prof, gstep, mesh):
    """Streaming epoch scan shared by the epoch-driven loops (vaegan / vae /
    gan / wgan / diffusion): compiled scans over fixed-size chunks of stacked
    batches, staging chunk i+1 on host while the device runs chunk i. At
    most two compiled shapes per run (chunk + remainder); peak extra host
    memory ~2 chunks, so the device-resident path works on datasets larger
    than host RAM headroom. ``epoch_fn(state, chunk, key) -> (state, means)``
    is a jitted scanned-epoch (trainer.train_epoch*). Returns
    (state, sums, count, gstep) where ``sums`` are step-weighted metric sums
    (divide by ``count`` for the epoch mean)."""
    put_stacked = _dp_put(mesh, ndim=5, stacked=True)
    staged = _stack_next(train_iter, min(chunk_steps, steps_per_epoch))
    chunk_metrics, count = [], 0
    while staged is not None:
        cur = put_stacked(staged)
        n = cur.shape[0]
        prof.chunk_begin(gstep, gstep + n)
        state, m = epoch_fn(
            state, cur, jax.random.fold_in(key, epoch * 1_000_003 + count))
        count += n
        gstep += n
        nxt = min(chunk_steps, steps_per_epoch - count)
        staged = _stack_next(train_iter, nxt) if nxt > 0 else None
        chunk_metrics.append((n, m))   # fetch AFTER the loop — fetching
        # here would sync and kill the staging overlap
        prof.chunk_end(gstep, sync=state)
    sums = {}
    for n, m in chunk_metrics:
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v) * n
    return state, sums, count, gstep


# ---------------------------------------------------------------------------
# VAE-GAN (vaegan_code.py:18-219)
# ---------------------------------------------------------------------------

def run_vaegan(cfg: VAEGANConfig, epochs: Optional[int] = None,
               max_steps_per_epoch: Optional[int] = None,
               feature_fn: Optional[Callable] = None,
               resume: bool = False,
               epoch_scan: Optional[bool] = None) -> Dict:
    """epoch_scan: scan the whole epoch on-device in one compiled program
    (auto-enabled when an epoch of batches is < ~2 GiB)."""
    from vgd_tpu.train.vaegan import VAEGANTrainer

    key = _setup(cfg.run)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    mesh = _dp_mesh(cfg.run, cfg.data.batch_size)
    trainer = VAEGANTrainer(cfg, img_shape)
    state = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"),
                        keep=cfg.run.keep_checkpoints)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state, rkey, start_epoch = ckpt.restore(
            state, key_impl=cfg.run.prng_impl)
        key = rkey if rkey is not None else key
    state = _dp_state(mesh, state)
    log = MetricLog(cfg.run.out_dir)
    prof = _Profiler(cfg.run)
    fixed_z = jax.random.normal(jax.random.fold_in(key, 7),
                                (64, cfg.latent_dim))
    epochs = cfg.epochs if epochs is None else epochs

    steps_per_epoch = len(train)
    if max_steps_per_epoch is not None:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    if epoch_scan is None:
        epoch_scan = True   # streaming chunks: no epoch-size gate needed

    chunk_steps = _chunk_steps(cfg.data.batch_size, img_shape,
                               steps_per_epoch)

    gstep = 0
    for epoch in range(start_epoch, epochs):
        ramp = jnp.float32(trainer.kl_ramp(epoch))
        sums, count, n_sampled, t0 = {}, 0, 0, time.perf_counter()
        if epoch_scan:
            state, sums, count, gstep = _stream_epoch_scan(
                lambda s_, c_, k_: trainer.train_epoch(s_, c_, k_, ramp),
                state, (b for b, _ in train.epoch()), steps_per_epoch,
                chunk_steps, key, epoch, prof, gstep, mesh)
            n_sampled = count
        else:
            batches = device_prefetch((b for b, _ in train.epoch()), size=2,
                                      sharding=_dp_sharding(mesh))
            for i, batch in enumerate(batches):
                if max_steps_per_epoch is not None and \
                        i >= max_steps_per_epoch:
                    break
                prof.step(gstep)
                state, m = trainer.train_step(state, batch,
                                              jax.random.fold_in(key, gstep),
                                              ramp)
                gstep += 1
                count += 1
                # fetch loss scalars only every 50 steps — the reference
                # syncs .item() 3x per batch (vaegan_code.py:125-127)
                if count == 1 or count % 50 == 0:
                    n_sampled += 1
                    for k, v in m.items():
                        sums[k] = sums.get(k, 0.0) + float(v)
        dt = time.perf_counter() - t0
        ips = count * cfg.data.batch_size / max(dt, 1e-9)

        # validation: denoise pass + SSIM/PSNR/MSE (+IS/FID) — the
        # reference's per-epoch loop (vaegan_code.py:143-191). All per-batch
        # values stay on device (async dispatch); ONE host fetch per val
        # epoch, like the train side — per-batch float() syncs are exactly
        # the reference's .item() pathology (SURVEY.md §3.1, eval side)
        acc = MetricAccumulator(feature_fn=feature_fn)
        val_rows, panel = [], None
        tv0 = time.perf_counter()
        for j, (vbatch, n_valid) in enumerate(val.epoch()):
            ev = trainer.eval_step(state, jnp.asarray(vbatch),
                                   jax.random.fold_in(key, 10_000 + j))
            img = to_signed(jnp.asarray(vbatch))
            # slice padded rows off every metric input (the val Loader pads
            # the last batch to a static shape) — only the true val set may
            # contribute (vaegan_code.py:165-185); the reference's batch loss
            # is mean MSE + alpha * sum KL (vaegan_code.py:160-167)
            acc.update(signed_to_unit(ev["recon"]), signed_to_unit(img),
                       n_valid=n_valid)
            val_rows.append((
                n_valid,
                jnp.mean(ev["per_mse"][:n_valid]),
                jnp.sum(ev["per_kl"][:n_valid]),
                psnr(signed_to_unit(ev["recon"][:n_valid]),
                     signed_to_unit(img[:n_valid]))))
            if panel is None:
                panel = (ev["noisy"], img, ev["recon"])
        fetched = jax.device_get([r[1:] for r in val_rows])
        val_loss = sum((m + cfg.alpha_kl * k_) * r[0]
                       for r, (m, k_, _) in zip(val_rows, fetched))
        n_val = sum(r[0] for r in val_rows)
        psnr_sum = sum(p * r[0] for r, (_, _, p) in zip(val_rows, fetched))
        if panel is not None:
            panel = tuple(np.asarray(a) for a in panel)
        metrics = acc.compute()
        metrics["psnr"] = psnr_sum / max(n_val, 1)
        row = {("train_" + k): v / max(1, n_sampled)
               for k, v in sums.items()}
        row.update(val_loss=val_loss / max(n_val, 1),
                   images_per_sec=ips,
                   val_secs=time.perf_counter() - tv0, **metrics)
        log.append(epoch=epoch, **row)
        print(f"[vaegan] epoch {epoch + 1}/{epochs} "
              f"recon={row.get('train_recon', 0):.4f} "
              f"val={row['val_loss']:.4f} ssim={metrics.get('ssim', 0):.4f} "
              f"psnr={metrics.get('psnr', 0):.2f} {ips:.0f} img/s")

        if (epoch + 1) % cfg.run.checkpoint_every_epochs == 0:
            ckpt.save(epoch + 1, state, key)
        if panel is not None:   # val split can be empty on tiny datasets
            save_triplets(*panel, os.path.join(
                cfg.run.out_dir, f"vaegan_decode_epoch_{epoch + 1:04d}.jpg"))
        fake = trainer.generate(state, fixed_z)
        save_grid(np.asarray(fake), os.path.join(
            cfg.run.out_dir, f"vaegan_fake_epoch_{epoch + 1:04d}.jpg"))
        _epoch_metrics_header(log, cfg.run.out_dir)
    prof.close()
    ckpt.close()
    return {"state": state, "log": log.history}


# ---------------------------------------------------------------------------
# Denoising VAE (main_vae.py:60-213)
# ---------------------------------------------------------------------------

def run_vae(cfg: VAEConfig, epochs: Optional[int] = None,
            max_steps_per_epoch: Optional[int] = None,
            resume: bool = False,
            epoch_scan: Optional[bool] = None) -> Dict:
    """epoch_scan: streaming compiled epoch chunks. Default False for this
    family: measured on-chip at 64px the scan LOSES to per-step prefetch
    dispatch (0.95x, BASELINE.md round-4 epoch-scan A/B) — --epoch-scan
    opts in."""
    from vgd_tpu.train.vae import VAETrainer

    key = _setup(cfg.run)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    mesh = _dp_mesh(cfg.run, cfg.data.batch_size)
    trainer = VAETrainer(cfg, img_shape)
    state = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"),
                        keep=cfg.run.keep_checkpoints)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state, rkey, start_epoch = ckpt.restore(
            state, key_impl=cfg.run.prng_impl)
        key = rkey if rkey is not None else key
    state = _dp_state(mesh, state)
    log = MetricLog(cfg.run.out_dir, "vae_loss")
    prof = _Profiler(cfg.run)
    fixed_z = jax.random.normal(jax.random.fold_in(key, 7),
                                (64, cfg.latent_dim))
    epochs = cfg.epochs if epochs is None else epochs
    steps_per_epoch = len(train)
    if max_steps_per_epoch is not None:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    if epoch_scan is None:
        epoch_scan = False
    chunk_steps = _chunk_steps(cfg.data.batch_size, img_shape,
                               steps_per_epoch)

    gstep = 0
    for epoch in range(start_epoch, epochs):
        ramp = jnp.float32(min(epoch / cfg.kl_warmup_epochs, 1.0))
        t0 = time.perf_counter()
        if epoch_scan:
            state, sums, count, gstep = _stream_epoch_scan(
                lambda s_, c_, k_: trainer.train_epoch(s_, c_, k_, ramp),
                state, (b for b, _ in train.epoch()), steps_per_epoch,
                chunk_steps, key, epoch, prof, gstep, mesh)
            total = sums.get("total", 0.0)
        else:
            total_dev, count = None, 0
            batches = device_prefetch((b for b, _ in train.epoch()), size=2,
                                      sharding=_dp_sharding(mesh))
            for i, batch in enumerate(batches):
                if max_steps_per_epoch is not None and \
                        i >= max_steps_per_epoch:
                    break
                prof.step(gstep)
                state, m = trainer.train_step(state, batch,
                                              jax.random.fold_in(key, gstep),
                                              ramp)
                gstep += 1
                count += 1
                # device-resident accumulation: float(m) every step would
                # sync host<->device per batch — exactly the reference's
                # .item() pathology (SURVEY.md §3.1); one fetch per epoch
                total_dev = m["total"] if total_dev is None \
                    else total_dev + m["total"]
            total = float(total_dev) if count else 0.0
        ips = count * cfg.data.batch_size / max(time.perf_counter() - t0,
                                                1e-9)
        # device-resident val metrics: ONE host fetch per val epoch (the
        # train side already accumulates on device; per-batch float() syncs
        # are the reference's .item() pathology, SURVEY.md §3.1)
        val_rows, panel = [], None
        for j, (vbatch, n_valid) in enumerate(val.epoch()):
            ev = trainer.eval_step(state, jnp.asarray(vbatch),
                                   jax.random.fold_in(key, 20_000 + j))
            img = to_signed(jnp.asarray(vbatch))
            # true-rows-only batch loss (mean MSE + raw-sum KL,
            # main_vae.py:119-121) — padded repeats must not contribute;
            # quality metrics over the true (unpadded) rows only
            ru = signed_to_unit(ev["recon"][:n_valid])
            iu = signed_to_unit(img[:n_valid])
            val_rows.append((n_valid,
                             jnp.mean(ev["per_mse"][:n_valid]),
                             jnp.sum(ev["per_kl"][:n_valid]),
                             mse_metric(ru, iu), psnr(ru, iu), ssim(ru, iu)))
            if panel is None:
                panel = (ev["noisy"], img, ev["recon"])
        fetched = jax.device_get([r[1:] for r in val_rows])
        val_loss = sum((m + k_) * r[0]
                       for r, (m, k_, *_rest) in zip(val_rows, fetched))
        n_val = sum(r[0] for r in val_rows)
        mse_v = sum(v[2] * r[0] for r, v in zip(val_rows, fetched))
        psnr_v = sum(v[3] * r[0] for r, v in zip(val_rows, fetched))
        ssim_v = sum(v[4] * r[0] for r, v in zip(val_rows, fetched))
        if panel is not None:
            panel = tuple(np.asarray(a) for a in panel)
        n_b = max(n_val, 1)
        log.append(epoch=epoch, train_loss=total / max(count, 1),
                   val_loss=val_loss / max(n_val, 1), images_per_sec=ips,
                   mse=mse_v / n_b, psnr=psnr_v / n_b, ssim=ssim_v / n_b)
        print(f"[vae] epoch {epoch + 1}/{epochs} "
              f"train={total / max(count, 1):.4f} "
              f"psnr={psnr_v / n_b:.2f} ssim={ssim_v / n_b:.4f} "
              f"{ips:.0f} img/s")
        if (epoch + 1) % cfg.run.checkpoint_every_epochs == 0:
            ckpt.save(epoch + 1, state, key)
        if panel is not None:   # val split can be empty on tiny datasets
            save_triplets(*panel, os.path.join(
                cfg.run.out_dir, f"valimg_{epoch:04d}.jpg"))
        fake = trainer.generate(state, fixed_z)
        save_grid(np.asarray(fake), os.path.join(
            cfg.run.out_dir, f"vae_fake_epoch_{epoch + 1:04d}.jpg"))
        _epoch_metrics_header(log, cfg.run.out_dir, "vae_")
    prof.close()
    ckpt.close()
    return {"state": state, "log": log.history}


# ---------------------------------------------------------------------------
# DCGAN / WGAN (gan_code.py:162-372)
# ---------------------------------------------------------------------------

def run_gan(cfg: GANConfig, epochs: Optional[int] = None,
            max_steps_per_epoch: Optional[int] = None,
            resume: bool = False,
            epoch_scan: Optional[bool] = None) -> Dict:
    """epoch_scan: streaming compiled epoch chunks. Default False for this
    family: measured on-chip at 64px the scan LOSES to per-step prefetch
    dispatch (0.79x, BASELINE.md round-4 epoch-scan A/B) — --epoch-scan
    opts in."""
    from vgd_tpu.train.gan import GANTrainer

    key = _setup(cfg.run)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    mesh = _dp_mesh(cfg.run, cfg.data.batch_size)
    trainer = GANTrainer(cfg, img_shape)
    state = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"),
                        keep=cfg.run.keep_checkpoints)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state, rkey, start_epoch = ckpt.restore(
            state, key_impl=cfg.run.prng_impl)
        key = rkey if rkey is not None else key
    state = _dp_state(mesh, state)
    log = MetricLog(cfg.run.out_dir, "gan_loss")
    prof = _Profiler(cfg.run)
    fixed_z = jax.random.normal(jax.random.fold_in(key, 7),
                                (64, 1, 1, cfg.latent_dim))
    epochs = cfg.epochs if epochs is None else epochs
    step_fn = trainer.train_step_wgan if cfg.wgan else trainer.train_step
    epoch_fn = trainer.train_epoch_wgan if cfg.wgan else trainer.train_epoch
    steps_per_epoch = len(train)
    if max_steps_per_epoch is not None:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    if epoch_scan is None:
        epoch_scan = False
    chunk_steps = _chunk_steps(cfg.data.batch_size, img_shape,
                               steps_per_epoch)

    gstep = 0
    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        if epoch_scan:
            state, sums, count, gstep = _stream_epoch_scan(
                epoch_fn, state, (b for b, _ in train.epoch()),
                steps_per_epoch, chunk_steps, key, epoch, prof, gstep, mesh)
            d_sum = sums.get("d_loss", 0.0)
            g_sum = sums.get("g_loss", 0.0)
        else:
            d_dev = g_dev = None
            count = 0
            batches = device_prefetch((b for b, _ in train.epoch()), size=2,
                                      sharding=_dp_sharding(mesh))
            for i, batch in enumerate(batches):
                if max_steps_per_epoch is not None and \
                        i >= max_steps_per_epoch:
                    break
                prof.step(gstep)
                state, m = step_fn(state, batch,
                                   jax.random.fold_in(key, gstep))
                gstep += 1
                count += 1
                # device-resident loss accumulation (one host fetch per
                # epoch, not per-batch .item() syncs, SURVEY.md §3.1)
                d_dev = m["d_loss"] if d_dev is None else d_dev + m["d_loss"]
                g_dev = m["g_loss"] if g_dev is None else g_dev + m["g_loss"]
            d_sum = float(d_dev) if count else 0.0
            g_sum = float(g_dev) if count else 0.0
        ips = count * cfg.data.batch_size / max(time.perf_counter() - t0,
                                                1e-9)
        log.append(epoch=epoch, d_loss=d_sum / max(count, 1),
                   g_loss=g_sum / max(count, 1), images_per_sec=ips)
        print(f"[{'wgan' if cfg.wgan else 'gan'}] epoch {epoch + 1}/{epochs} "
              f"D={d_sum / max(count, 1):.4f} G={g_sum / max(count, 1):.4f} "
              f"{ips:.0f} img/s")
        if (epoch + 1) % cfg.run.checkpoint_every_epochs == 0:
            ckpt.save(epoch + 1, state, key)
        fake = trainer.generate(state, fixed_z)
        save_grid(np.asarray(fake), os.path.join(
            cfg.run.out_dir, f"gan_fake_epoch_{epoch + 1:04d}.jpg"))
        _epoch_metrics_header(log, cfg.run.out_dir, "gan_")
    prof.close()
    ckpt.close()
    return {"state": state, "log": log.history}


def evaluate_gan_checkpoints(cfg: GANConfig, feature_fn=None,
                             max_checkpoints: Optional[int] = None) -> list:
    """Sweep saved checkpoints, generating from the prior and scoring
    SSIM/IS/FID vs the val set (eval_gan/evaluate_gan, gan_code.py:99-160)."""
    from vgd_tpu.train.gan import GANTrainer

    key = seed_all(cfg.run.seed)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    trainer = GANTrainer(cfg, img_shape)
    template = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"))
    steps = ckpt.manager.all_steps()
    if max_checkpoints:
        steps = steps[-max_checkpoints:]
    results = []
    for s in steps:
        state, _, _ = ckpt.restore(template, step=s)
        acc = MetricAccumulator(feature_fn=feature_fn)
        for j, (vbatch, n_valid) in enumerate(val.epoch()):
            z = jax.random.normal(jax.random.fold_in(key, j),
                                  (len(vbatch), 1, 1, cfg.latent_dim))
            fake = trainer.generate(state, z)
            real = to_signed(jnp.asarray(vbatch))
            acc.update(signed_to_unit(fake), signed_to_unit(real),
                       n_valid=n_valid)
        results.append({"step": s, **acc.compute()})
    np.savez(os.path.join(cfg.run.out_dir, "metrics.npz"),
             results=np.array([list(r.values()) for r in results]),
             columns=np.array(list(results[0].keys()) if results else [],
                              dtype=object))
    return results


# ---------------------------------------------------------------------------
# Glow image / EEG (nf_code.py:560-625, flow_eeg.py:343-422)
# ---------------------------------------------------------------------------

def run_glow(cfg: GlowConfig, n_iter: Optional[int] = None,
             resume: bool = False) -> Dict:
    from vgd_tpu.train.glow import GlowTrainer

    key = _setup(cfg.run)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    mesh = _dp_mesh(cfg.run, cfg.data.batch_size,
                    model_consumer="pp" if cfg.pp_stages > 0 else "tp")
    pp_mesh = None
    if cfg.pp_stages > 0:
        from vgd_tpu.parallel.mesh import MODEL_AXIS
        if mesh is None or mesh.shape[MODEL_AXIS] != cfg.pp_stages:
            have = 0 if mesh is None else mesh.shape[MODEL_AXIS]
            raise ValueError(
                f"--pp-stages {cfg.pp_stages} needs a mesh whose model axis "
                f"has exactly that many devices (have {have}); pass "
                f"--mesh-model {cfg.pp_stages} or leave it unset (the CLI "
                "sizes it automatically) and provide enough devices")
        if cfg.n_flows % cfg.pp_stages != 0:
            raise ValueError(f"n_flows={cfg.n_flows} must divide evenly "
                             f"over --pp-stages {cfg.pp_stages}")
        pp_mesh = mesh
    trainer = GlowTrainer(cfg, img_shape, pp_mesh=pp_mesh)
    state = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"),
                        keep=cfg.run.keep_checkpoints)
    log = MetricLog(cfg.run.out_dir, "glow_loss")
    prof = _Profiler(cfg.run)
    z_sample = trainer.sample_z(jax.random.fold_in(key, 7), cfg.n_samples)
    n_iter = cfg.n_iter if n_iter is None else n_iter
    sample_dir = os.path.join(cfg.run.out_dir, "sample")
    os.makedirs(sample_dir, exist_ok=True)

    start = 0
    if resume and ckpt.latest_step() is not None:
        state, rkey, start = ckpt.restore(state,
                                           key_impl=cfg.run.prng_impl)
        key = rkey if rkey is not None else key
    # fast-forward the shuffled stream on resume: the fresh run consumes
    # batch 0 in init_step and batch i+1 at iteration i, so a run resumed at
    # `start` continues from batch start+1 — continuation-equivalent, no
    # re-used data (the skip replays permutations only, not decode work)
    batches = train.stream(start + 1) if start > 0 else iter(train)
    state = _glow_state_placement(mesh, state, cfg)
    put = _dp_put(mesh)
    if start == 0:
        # data-dependent ActNorm init on the first batch (nf_code.py:589-594)
        state = trainer.init_step(state, put(next(batches)), key)
    t0 = time.perf_counter()
    for i in range(start, n_iter):
        prof.step(i)
        state, m = trainer.train_step(state, put(next(batches)),
                                      jax.random.fold_in(key, i))
        if (i + 1) % cfg.run.sample_every_iters == 0:
            imgs = trainer.reverse(state, z_sample)
            save_grid(np.asarray(imgs) * 2.0, os.path.join(
                sample_dir, f"{i + 1:06d}.png"), nrow=4)
            ips = cfg.run.sample_every_iters * cfg.data.batch_size / \
                max(time.perf_counter() - t0, 1e-9)
            t0 = time.perf_counter()
            log.append(iter=i + 1, loss=float(m["loss"]),
                       log_p=float(m["log_p"]), logdet=float(m["logdet"]),
                       images_per_sec=ips)
            print(f"[glow] iter {i + 1}/{n_iter} "
                  f"loss={float(m['loss']):.4f} {ips:.0f} img/s")
        if (i + 1) % cfg.run.checkpoint_every_iters == 0:
            ckpt.save(i + 1, state, key)
    if ckpt.latest_step() != n_iter:   # always leave a final checkpoint
        ckpt.save(n_iter, state, key, wait=True)
    _epoch_metrics_header(log, cfg.run.out_dir, "glow_")
    prof.close()
    ckpt.close()
    return {"state": state, "log": log.history, "trainer": trainer,
            "val": val}


def evaluate_glow(cfg: GlowConfig, state, trainer, val,
                  feature_fn=None, max_batches: Optional[int] = None) -> Dict:
    """Generate at temperature and score SSIM/IS/FID vs val
    (eval_glow, nf_code.py:647-701; images mapped [-0.5,0.5] -> [0,1])."""
    key = seed_all(cfg.run.seed)
    acc = MetricAccumulator(feature_fn=feature_fn)
    for j, (vbatch, n_valid) in enumerate(val.epoch()):
        if max_batches is not None and j >= max_batches:
            break
        z = trainer.sample_z(jax.random.fold_in(key, j), len(vbatch))
        fake = trainer.reverse(state, z)
        fake_unit = jnp.clip(fake + 0.5, 0.0, 1.0)   # nf_code.py:685
        real_unit = jnp.asarray(vbatch, jnp.float32) / 255.0
        acc.update(fake_unit, real_unit, n_valid=n_valid)
    return acc.compute()


def run_glow_eeg(cfg: GlowEEGConfig, n_iter: Optional[int] = None,
                 resume: bool = False) -> Dict:
    from vgd_tpu.train.glow import GlowEEGTrainer

    key = _setup(cfg.run)
    ds = EEGDataset(path=cfg.eeg_path, dataset_type="T",
                    event_type=cfg.event_type, seed=cfg.run.seed)
    trainer = GlowEEGTrainer(cfg)
    state = trainer.init(key, cfg.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir,
                                     f"ckpt_{cfg.event_type}"),
                        keep=cfg.run.keep_checkpoints)
    log = MetricLog(cfg.run.out_dir, f"eeg_{cfg.event_type}")
    z_sample = trainer.sample_z(jax.random.fold_in(key, 7), cfg.n_samples)
    n_iter = cfg.n_iter if n_iter is None else n_iter
    sample_dir = os.path.join(cfg.run.out_dir, "sample")
    os.makedirs(sample_dir, exist_ok=True)

    start = 0
    if resume and ckpt.latest_step() is not None:
        state, rkey, start = ckpt.restore(state,
                                           key_impl=cfg.run.prng_impl)
        key = rkey if rkey is not None else key
    # continuation-equivalent stream position (see run_glow)
    batches = eeg_batches(ds, cfg.batch_size, seed=cfg.run.seed,
                          skip=start + 1 if start > 0 else 0)
    mesh = _dp_mesh(cfg.run, cfg.batch_size, model_consumer="tp")
    state = _glow_state_placement(mesh, state, cfg)
    put = _dp_put(mesh)
    if start == 0:
        state = trainer.init_step(state, put(next(batches)), key)
    for i in range(start, n_iter):
        state, m = trainer.train_step(state, put(next(batches)),
                                      jax.random.fold_in(key, i))
        if (i + 1) % cfg.run.sample_every_iters == 0:
            fakes = trainer.reverse(state, z_sample)
            # (B, T, 1, C) -> (B, C, T) like the reference's npz dumps
            arr = np.asarray(fakes)[:, :, 0, :].transpose(0, 2, 1)
            np.savez(os.path.join(
                sample_dir,
                f"fake_eeg_{cfg.event_type}_training_{i + 1}.npz"), arr)
            # trace plot of the first generated trial (flow_eeg.py:414-417)
            from vgd_tpu.data.eeg import CHANNEL_NAMES
            from vgd_tpu.utils.viz import plot_eeg_signals
            plot_eeg_signals(arr, os.path.join(
                sample_dir,
                f"fake_eeg_{cfg.event_type}_training_{i + 1}.png"),
                channel_names=CHANNEL_NAMES)
            log.append(iter=i + 1, loss=float(m["loss"]))
            print(f"[glow-eeg:{cfg.event_type}] iter {i + 1}/{n_iter} "
                  f"loss={float(m['loss']):.4f}")
        if (i + 1) % cfg.run.checkpoint_every_iters == 0:
            ckpt.save(i + 1, state, key)
    if ckpt.latest_step() != n_iter:   # always leave a final checkpoint
        ckpt.save(n_iter, state, key, wait=True)
    _epoch_metrics_header(log, cfg.run.out_dir, f"eeg_{cfg.event_type}_")
    ckpt.close()
    # post-training artifacts (test_eegglow.py:12-46): real-vs-fake PSD
    # comparison + training-evolution GIF from the per-iteration trace PNGs
    try:
        eeg_psd_and_gif(cfg, state=state, trainer=trainer, dataset=ds)
    except Exception as e:   # artifacts must not kill a finished run
        print(f"[glow-eeg] post-training artifacts failed: {e}")
    return {"state": state, "log": log.history, "trainer": trainer}


def eeg_psd_and_gif(cfg: GlowEEGConfig, state=None, trainer=None,
                    dataset=None, n_fake: int = 64,
                    step: Optional[int] = None) -> Dict[str, str]:
    """Real-vs-fake PSD comparison figure + training-evolution GIF
    (test_eegglow.py:12-46: welch PSD overlay of real and generated trials,
    and the GIF assembled from the per-iteration sample plots). Restores
    the latest checkpoint when no state is given. Returns artifact paths."""
    import glob as _g

    from vgd_tpu.eval.eeg_downstream import mean_central_psd
    from vgd_tpu.utils.viz import save_gif

    key = seed_all(cfg.run.seed)
    if trainer is None or state is None:
        from vgd_tpu.train.glow import GlowEEGTrainer
        trainer = GlowEEGTrainer(cfg)
        template = trainer.init(key, cfg.batch_size)
        ckpt = Checkpointer(os.path.join(cfg.run.out_dir,
                                         f"ckpt_{cfg.event_type}"))
        state, _, s = ckpt.restore(template, step=step)
        print(f"[eval-eeg] restored checkpoint step {s}")
    if dataset is None:
        dataset = EEGDataset(path=cfg.eeg_path, dataset_type="T",
                             event_type=cfg.event_type, seed=cfg.run.seed)

    z = trainer.sample_z(jax.random.fold_in(key, 3), n_fake)
    fakes = trainer.reverse(state, z)                  # (N, T, 1, C)
    fake = np.asarray(fakes)[:, :, 0, :].transpose(0, 2, 1)  # (N, C, T)
    finite = np.isfinite(fake).all(axis=(1, 2))
    fake = fake[finite]
    real = dataset.as_ncT()

    fx_r, psd_r = mean_central_psd(real)
    fx_f, psd_f = mean_central_psd(fake)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.semilogy(fx_r, psd_r, label=f"real (n={len(real)})")
    ax.semilogy(fx_f, psd_f, label=f"generated (n={len(fake)})")
    ax.set_xlabel("frequency [Hz]")
    ax.set_ylabel("PSD")
    ax.set_title(f"central-channel PSD, event '{cfg.event_type}'")
    ax.grid(True, alpha=0.3)
    ax.legend()
    psd_path = os.path.join(cfg.run.out_dir,
                            f"psd_comparison_{cfg.event_type}.jpg")
    fig.savefig(psd_path, bbox_inches="tight", dpi=90)
    plt.close(fig)

    frames = sorted(
        _g.glob(os.path.join(cfg.run.out_dir, "sample",
                             f"fake_eeg_{cfg.event_type}_training_*.png")),
        key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    gif_path = os.path.join(cfg.run.out_dir,
                            f"training_evolution_{cfg.event_type}.gif")
    if frames:
        save_gif(frames, gif_path)
    else:
        gif_path = ""
    print(f"[eval-eeg] psd={psd_path} gif={gif_path or '(no frames)'}")
    return {"psd": psd_path, "gif": gif_path}


# ---------------------------------------------------------------------------
# Diffusion (train_diffusion.py:68-151)
# ---------------------------------------------------------------------------

def run_diffusion(cfg: DiffusionConfig, epochs: Optional[int] = None,
                  max_steps_per_epoch: Optional[int] = None,
                  resume: bool = False,
                  epoch_scan: Optional[bool] = None) -> Dict:
    """epoch_scan: streaming compiled epoch chunks — default True here,
    measured 1.59x over per-step dispatch at 64px (BASELINE.md round-4
    epoch-scan A/B)."""
    from vgd_tpu.train.diffusion import DiffusionTrainer

    key = _setup(cfg.run)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    mesh = _dp_mesh(cfg.run, cfg.data.batch_size, model_consumer="sp")
    # model axis > 1: bottleneck attention tokens ride the ring
    # (sequence parallelism); params stay replicated
    sp_mesh = None
    if mesh is not None:
        from vgd_tpu.parallel.mesh import MODEL_AXIS
        if mesh.shape[MODEL_AXIS] > 1:
            sp_mesh = mesh
    trainer = DiffusionTrainer(cfg, img_shape, sp_mesh=sp_mesh)
    state = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"),
                        keep=cfg.run.keep_checkpoints)
    start_epoch = 0
    if resume and ckpt.latest_step() is not None:
        state, rkey, start_epoch = ckpt.restore(
            state, key_impl=cfg.run.prng_impl)
        key = rkey if rkey is not None else key
    state = _dp_state(mesh, state)
    log = MetricLog(cfg.run.out_dir, "diffusion_loss")
    prof = _Profiler(cfg.run)
    epochs = cfg.epochs if epochs is None else epochs
    steps_per_epoch = len(train)
    if max_steps_per_epoch is not None:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    if epoch_scan is None:
        epoch_scan = True
    chunk_steps = _chunk_steps(cfg.data.batch_size, img_shape,
                               steps_per_epoch)

    gstep = 0
    for epoch in range(start_epoch, epochs):
        t0 = time.perf_counter()
        if epoch_scan:
            state, sums, count, gstep = _stream_epoch_scan(
                trainer.train_epoch, state, (b for b, _ in train.epoch()),
                steps_per_epoch, chunk_steps, key, epoch, prof, gstep, mesh)
            total = sums.get("loss", 0.0)
        else:
            total_dev, count = None, 0
            batches = device_prefetch((b for b, _ in train.epoch()), size=2,
                                      sharding=_dp_sharding(mesh))
            for i, batch in enumerate(batches):
                if max_steps_per_epoch is not None and \
                        i >= max_steps_per_epoch:
                    break
                prof.step(gstep)
                state, m = trainer.train_step(state, batch,
                                              jax.random.fold_in(key, gstep))
                gstep += 1
                count += 1
                # device-resident accumulation (SURVEY.md §3.1)
                total_dev = m["loss"] if total_dev is None \
                    else total_dev + m["loss"]
            total = float(total_dev) if count else 0.0
        ips = count * cfg.data.batch_size / max(time.perf_counter() - t0,
                                                1e-9)
        # device-resident val losses: one fetch per epoch (SURVEY.md §3.1)
        vl_rows = []
        for j, (vbatch, n_valid) in enumerate(val.epoch()):
            vl = trainer.eval_loss(state, jnp.asarray(vbatch),
                                   jax.random.fold_in(key, 30_000 + j))
            # per-sample losses: sum the TRUE rows only (padded repeats of
            # the last row must not contribute)
            vl_rows.append((n_valid, jnp.sum(vl[:n_valid])))
        val_total = sum(float(v) for v in
                        jax.device_get([r[1] for r in vl_rows]))
        n_val = sum(r[0] for r in vl_rows)
        log.append(epoch=epoch,
                   train_loss=total / max(count, 1),
                   val_loss=val_total / max(n_val, 1), images_per_sec=ips)
        print(f"[diffusion] epoch {epoch + 1}/{epochs} "
              f"train={total / max(count, 1):.4f} "
              f"val={val_total / max(n_val, 1):.4f} {ips:.0f} img/s")
        if (epoch + 1) % cfg.run.checkpoint_every_epochs == 0:
            ckpt.save(epoch + 1, state, key)
        _epoch_metrics_header(log, cfg.run.out_dir, "diffusion_")
    prof.close()
    ckpt.close()
    return {"state": state, "log": log.history, "trainer": trainer,
            "val": val}


def evaluate_diffusion(cfg: DiffusionConfig, state, trainer, val,
                       feature_fn=None, max_batches: Optional[int] = None,
                       save_panels: bool = True) -> Dict:
    """Restoration evaluation (test_diffusion.py:80-171): partially noise
    each val image to a random t, run the full compiled ancestral reverse
    chain, score SSIM/IS/FID (+PSNR), and save original/noisy/multi-step/
    one-step comparison panels."""
    from vgd_tpu.eval.metrics import psnr as psnr_fn
    from vgd_tpu.train.diffusion import q_sample

    key = seed_all(cfg.run.seed)
    acc = MetricAccumulator(feature_fn=feature_fn)
    psnr_sum, n_b = 0.0, 0
    for j, (vbatch, n_valid) in enumerate(val.epoch()):
        if max_batches is not None and j >= max_batches:
            break
        x0 = to_signed(jnp.asarray(vbatch))
        k_t, k_n, k_chain = jax.random.split(jax.random.fold_in(key, j), 3)
        # batch-wide random start step (the reference uses ts[0].item(),
        # test_diffusion.py:90)
        t_start = jax.random.randint(k_t, (), 0, cfg.timesteps)
        noise = jax.random.normal(k_n, x0.shape)
        t_vec = jnp.full((x0.shape[0],), t_start, jnp.int32)
        xt = q_sample(trainer.sched, x0, t_vec, noise)
        restored = trainer.ancestral_sample(state, xt, t_start, k_chain)
        fake_unit = signed_to_unit(restored)
        real_unit = signed_to_unit(x0)
        acc.update(fake_unit, real_unit, n_valid=n_valid)
        psnr_sum += float(psnr_fn(fake_unit[:n_valid],
                                  real_unit[:n_valid])) * n_valid
        n_b += n_valid
        if save_panels and j == 0:
            one_step = trainer.predict_x0(state, xt, t_vec)
            panels = [np.asarray(x0), np.asarray(jnp.clip(xt, -1, 1)),
                      np.asarray(restored), np.asarray(one_step)]
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            n_show = min(4, len(panels[0]))
            fig, axes = plt.subplots(4, n_show, figsize=(n_show * 2, 8))
            titles = ["original", "noisy", "multi-step", "one-step"]
            for r in range(4):
                for c_ in range(n_show):
                    ax = axes[r][c_] if n_show > 1 else axes[r]
                    ax.imshow(np.clip(panels[r][c_] * 0.5 + 0.5, 0, 1))
                    ax.set_axis_off()
                    if c_ == 0:
                        ax.set_title(titles[r], fontsize=8)
            os.makedirs(cfg.run.out_dir, exist_ok=True)
            fig.savefig(os.path.join(cfg.run.out_dir,
                                     "diffusion_restore_panel.jpg"),
                        bbox_inches="tight", dpi=90)
            plt.close(fig)
    out = acc.compute()
    out["psnr"] = psnr_sum / max(n_b, 1)
    return out


# ---------------------------------------------------------------------------
# Restore-and-evaluate entry points (the reference's runnable eval scripts:
# gan_code.py:147 eval_gan, nf_code.py:647 eval_glow, test_diffusion.py:41,
# main_vae.py:215-641 test_vae / evaluate_vae / eval_vae)
# ---------------------------------------------------------------------------

def load_feature_fn(enabled: bool, weights_path: Optional[str] = None,
                    feature: str = "64"):
    """(feature_fn, tag) for IS/FID, or (None, None) when disabled."""
    if not enabled and weights_path is None:
        return None, None
    from vgd_tpu.eval.inception import load_inception
    return load_inception(weights_path, feature=feature)


def evaluate_vae_checkpoints(cfg: VAEConfig, feature_fn=None,
                             max_checkpoints: Optional[int] = None,
                             max_encode_batches: Optional[int] = None,
                             max_eval_batches: Optional[int] = None) -> list:
    """Aggregated-posterior checkpoint sweep (main_vae.py:438-512
    ``evaluate_vae`` + 514-575 ``eval_vae``): for every saved checkpoint,
    encode the train+val sets, build per-dimension empirical CDFs over
    (mu, logvar), inverse-transform sample, reparameterize, decode, and
    score SSIM/IS/FID of the generated images against the val set. Saves
    one sample grid per checkpoint + ``vae_eval_metrics.npz``."""
    import functools

    from vgd_tpu.eval.sampling import aggregated_posterior_sampler
    from vgd_tpu.models.vae import reparameterize
    from vgd_tpu.train.vae import VAETrainer

    key = seed_all(cfg.run.seed)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    trainer = VAETrainer(cfg, img_shape)
    template = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"))
    steps = ckpt.manager.all_steps()
    if max_checkpoints:
        steps = steps[-max_checkpoints:]

    @jax.jit
    def encode(enc_vars, batch_uint8):
        return trainer.encoder.apply(enc_vars, to_signed(batch_uint8),
                                     train=False)

    results = []
    for s in steps:
        state, _, _ = ckpt.restore(template, step=s)
        encode_fn = functools.partial(encode, state.encoder.variables())

        class _Trunc:
            """Loader view truncated to max_encode_batches."""

            def __init__(self, loader):
                self.loader = loader

            def epoch(self):
                for i, item in enumerate(self.loader.epoch()):
                    if max_encode_batches is not None and \
                            i >= max_encode_batches:
                        break
                    yield item

        sampler = aggregated_posterior_sampler(
            encode_fn, [_Trunc(train), _Trunc(val)], seed=cfg.run.seed)

        acc = MetricAccumulator(feature_fn=feature_fn)
        grid = None
        for j, (vbatch, n_valid) in enumerate(val.epoch()):
            if max_eval_batches is not None and j >= max_eval_batches:
                break
            mu, logvar = sampler(len(vbatch))
            z, _ = reparameterize(jax.random.fold_in(key, j),
                                  jnp.asarray(mu), jnp.asarray(logvar))
            fake = trainer.generate(state, z)
            real = to_signed(jnp.asarray(vbatch))
            acc.update(signed_to_unit(fake), signed_to_unit(real),
                       n_valid=n_valid)
            if grid is None:
                grid = np.asarray(fake)
        row = {"step": s, **acc.compute()}
        results.append(row)
        save_grid(grid, os.path.join(cfg.run.out_dir,
                                     f"vae_aggpost_step_{s:06d}.jpg"))
        print(f"[eval-vae] ckpt {s}: " +
              " ".join(f"{k}={v:.4f}" for k, v in row.items() if k != "step"))
    np.savez(os.path.join(cfg.run.out_dir, "vae_eval_metrics.npz"),
             results=np.array([list(r.values()) for r in results]),
             columns=np.array(list(results[0].keys()) if results else []))
    return results


def evaluate_vae_occlusion(cfg: VAEConfig,
                           max_batches: Optional[int] = None,
                           renoise_cycles: int = 2,
                           step: Optional[int] = None) -> Dict:
    """Occlusion test-set evaluation (dataset_code.py:44-56 +
    main_vae.py:236-343): build (occluded+noisy, clean) pairs with the
    corruption pipeline, restore the latest (or given) checkpoint, compute
    sum-reduction test loss + MSE/PSNR/SSIM, and emit the reference's visual
    artifacts — noisy/clean/recon triplets, re-noise cycling panels, and
    mu/logvar latent-traversal strips."""
    from vgd_tpu.data.corrupt import corrupt
    from vgd_tpu.eval.vae_analysis import (denoise_test_loss,
                                           latent_traversal, renoise_cycle)
    from vgd_tpu.train.vae import VAETrainer

    key = seed_all(cfg.run.seed)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    trainer = VAETrainer(cfg, img_shape)
    template = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"))
    state, _, s = ckpt.restore(template, step=step)
    print(f"[eval-vae --occlusion] restored checkpoint step {s}")

    noise_std = cfg.data.noise_max_std if cfg.data.noise_max_std else 0.5
    sums: Dict[str, float] = {}
    n_b, n_s = 0, 0
    first = None
    corrupt_jit = jax.jit(
        lambda k, img: corrupt(k, img, noise_std, occlusion=True))
    for j, (vbatch, n_valid) in enumerate(val.epoch()):
        if max_batches is not None and j >= max_batches:
            break
        # slice padded repeats off BEFORE corruption — only true test rows
        # may contribute (at most one extra compiled shape, eval-only)
        clean = to_signed(jnp.asarray(vbatch))[:n_valid]
        noisy = corrupt_jit(jax.random.fold_in(key, 40_000 + j), clean)
        m = denoise_test_loss(trainer, state, noisy, clean,
                              jax.random.fold_in(key, 50_000 + j))
        recon = m.pop("recon")
        # test_loss is a per-batch SUM (main_vae.py:258-267) -> average over
        # batches; quality metrics are per-image -> weight by sample count
        sums["test_loss"] = sums.get("test_loss", 0.0) + m.pop("test_loss")
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + v * n_valid
        n_b += 1
        n_s += n_valid
        if first is None:
            first = (np.asarray(noisy), np.asarray(clean), np.asarray(recon))
    out = {"test_loss": sums.pop("test_loss", 0.0) / max(n_b, 1)}
    out.update({k: v / max(n_s, 1) for k, v in sums.items()})
    if first is None:           # empty val split (tiny datasets)
        return out

    od = cfg.run.out_dir
    save_triplets(*first, os.path.join(od, "occlusion_triplets.jpg"))
    noisy0 = jnp.asarray(first[0])
    cycles = renoise_cycle(trainer, state, noisy0,
                           jax.random.fold_in(key, 60_000),
                           cycles=renoise_cycles)
    save_triplets(first[0], np.asarray(cycles[0]), np.asarray(cycles[-1]),
                  os.path.join(od, "occlusion_renoise_cycles.jpg"))
    for target in ("mu", "logvar"):
        frames = latent_traversal(trainer, state, noisy0[:1],
                                  jax.random.fold_in(key, 70_000),
                                  target=target)
        save_grid(np.asarray(frames),
                  os.path.join(od, f"occlusion_traversal_{target}.jpg"),
                  nrow=frames.shape[0])
    np.savez(os.path.join(od, "occlusion_metrics.npz"), **out)
    print("[eval-vae --occlusion] " +
          " ".join(f"{k}={v:.4f}" for k, v in out.items()))
    return out


def evaluate_glow_from_dir(cfg: GlowConfig, feature_fn=None,
                           max_batches: Optional[int] = None,
                           step: Optional[int] = None) -> Dict:
    """Restore the latest (or given) Glow checkpoint and run the
    temperature-sampled SSIM/IS/FID evaluation (nf_code.py:647-701)."""
    from vgd_tpu.train.glow import GlowTrainer

    key = seed_all(cfg.run.seed)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    trainer = GlowTrainer(cfg, img_shape)
    template = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"))
    state, _, s = ckpt.restore(template, step=step)
    print(f"[eval-glow] restored checkpoint step {s}")
    out = evaluate_glow(cfg, state, trainer, val, feature_fn=feature_fn,
                        max_batches=max_batches)
    np.savez(os.path.join(cfg.run.out_dir, "glow_eval_metrics.npz"), **out)
    print("[eval-glow] " + " ".join(f"{k}={v:.4f}" for k, v in out.items()))
    return out


def evaluate_diffusion_from_dir(cfg: DiffusionConfig, feature_fn=None,
                                max_batches: Optional[int] = None,
                                step: Optional[int] = None) -> Dict:
    """Restore the latest (or given) DDPM checkpoint and run the
    partial-noise restoration evaluation (test_diffusion.py:41-177)."""
    from vgd_tpu.train.diffusion import DiffusionTrainer

    key = seed_all(cfg.run.seed)
    train, val, img_shape = make_image_datasets(cfg.data, seed=cfg.run.seed)
    trainer = DiffusionTrainer(cfg, img_shape)
    template = trainer.init(key, cfg.data.batch_size)
    ckpt = Checkpointer(os.path.join(cfg.run.out_dir, "ckpt"))
    state, _, s = ckpt.restore(template, step=step)
    print(f"[eval-diffusion] restored checkpoint step {s}")
    out = evaluate_diffusion(cfg, state, trainer, val, feature_fn=feature_fn,
                             max_batches=max_batches)
    np.savez(os.path.join(cfg.run.out_dir, "diffusion_eval_metrics.npz"),
             **out)
    print("[eval-diffusion] " +
          " ".join(f"{k}={v:.4f}" for k, v in out.items()))
    return out


def sample_from_dir(family: str, cfg, n: int = 64,
                    out_path: Optional[str] = None,
                    step: Optional[int] = None, seed: int = 42,
                    ddim_steps: int = 0, ddim_eta: float = 0.0) -> str:
    """Generate a sample grid from a trained checkpoint — the runnable
    counterpart of the reference's interactive samplers (main_vae.py:348-374,
    gan_code.py:121-122, nf_code.py:613-621, test_diffusion.py:124-155).
    Returns the written path."""
    key = seed_all(seed)
    od = cfg.run.out_dir
    out_path = out_path or os.path.join(od, f"{family}_samples.jpg")

    if family in ("vaegan", "vae", "gan", "wgan"):
        if family == "vaegan":
            from vgd_tpu.train.vaegan import VAEGANTrainer as T
        elif family == "vae":
            from vgd_tpu.train.vae import VAETrainer as T
        else:
            from vgd_tpu.train.gan import GANTrainer as T
        train, val, img_shape = make_image_datasets(cfg.data,
                                                    seed=cfg.run.seed)
        trainer = T(cfg, img_shape)
        template = trainer.init(key, cfg.data.batch_size)
        ckpt = Checkpointer(os.path.join(od, "ckpt"))
        state, _, s = ckpt.restore(template, step=step)
        if family in ("gan", "wgan"):
            z = jax.random.normal(key, (n, 1, 1, cfg.latent_dim))
        else:
            z = jax.random.normal(key, (n, cfg.latent_dim))
        imgs = np.asarray(trainer.generate(state, z))
        save_grid(imgs, out_path)
    elif family == "glow":
        from vgd_tpu.train.glow import GlowTrainer
        train, val, img_shape = make_image_datasets(cfg.data,
                                                    seed=cfg.run.seed)
        trainer = GlowTrainer(cfg, img_shape)
        template = trainer.init(key, cfg.data.batch_size)
        ckpt = Checkpointer(os.path.join(od, "ckpt"))
        state, _, s = ckpt.restore(template, step=step)
        z = trainer.sample_z(key, n)
        imgs = np.asarray(trainer.reverse(state, z)) * 2.0
        save_grid(imgs, out_path)
    elif family == "glow-eeg":
        from vgd_tpu.data.eeg import CHANNEL_NAMES
        from vgd_tpu.train.glow import GlowEEGTrainer
        from vgd_tpu.utils.viz import plot_eeg_signals
        trainer = GlowEEGTrainer(cfg)
        template = trainer.init(key, cfg.batch_size)
        ckpt = Checkpointer(os.path.join(od, f"ckpt_{cfg.event_type}"))
        state, _, s = ckpt.restore(template, step=step)
        z = trainer.sample_z(key, n)
        fakes = trainer.reverse(state, z)
        arr = np.asarray(fakes)[:, :, 0, :].transpose(0, 2, 1)
        out_path = out_path if out_path.endswith(".png") else \
            out_path.rsplit(".", 1)[0] + ".png"
        plot_eeg_signals(arr, out_path, channel_names=CHANNEL_NAMES)
    elif family == "diffusion":
        from vgd_tpu.train.diffusion import DiffusionTrainer
        train, val, img_shape = make_image_datasets(cfg.data,
                                                    seed=cfg.run.seed)
        trainer = DiffusionTrainer(cfg, img_shape)
        template = trainer.init(key, cfg.data.batch_size)
        ckpt = Checkpointer(os.path.join(od, "ckpt"))
        state, _, s = ckpt.restore(template, step=step)
        x_t = jax.random.normal(key, (n,) + img_shape)
        if ddim_steps > 0:
            imgs = np.asarray(trainer.ddim_sample(
                state, x_t, jax.random.fold_in(key, 1), ddim_steps,
                eta=ddim_eta))
        else:
            imgs = np.asarray(trainer.ancestral_sample(
                state, x_t, jnp.int32(cfg.timesteps - 1),
                jax.random.fold_in(key, 1)))
        save_grid(imgs, out_path)
    else:
        raise ValueError(f"unknown family {family!r}")
    print(f"[sample] {family} checkpoint -> {out_path}")
    return out_path
