"""Trainers: staged setup + training loop.

Rebuild of reference train_parts/trainers.py:149-893 for the SPMD/TPU stack.
The staged-method structure is kept (setup_arguments -> setup_logs ->
setup_mesh -> init_params -> setup_dataset -> setup_networks ->
setup_augmentations -> setup_training_phases -> training_loop), but:

* NCCL/DDP/process-spawn (reference: starter.py:24-45, trainers.py:479-496,
  587-597) are replaced by ONE process driving a `jax.sharding.Mesh`;
* the phase engine runs jitted StepBuilder functions (train/steps.py) on a
  donated GANTrainState instead of mutating modules;
* check_ddp_consistency is moot (single logical param tree under SPMD);
* snapshots are msgpack pytrees + training_options.json (config-reconstruct
  instead of code pickling).

The 'sg2' trainer differs only in defaults (loss arch with style mixing);
the mapping/synthesis DDP split of the reference (trainers.py:881-893) has
no SPMD equivalent to manage.
"""

from __future__ import annotations

import copy
import json
import os
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from style_big_gan_tpu import registries
from style_big_gan_tpu.augment.ada import AUGPIPE_SPECS
from style_big_gan_tpu.augment.controller import AdaController
from style_big_gan_tpu.parallel import mesh as mesh_lib
from style_big_gan_tpu.parallel.stats import Collector
from style_big_gan_tpu.train.loss_arch import merge_vars, split_vars
from style_big_gan_tpu.train.state import create_train_state
from style_big_gan_tpu.train.steps import StepBuilder
from style_big_gan_tpu.utils import checkpoint as ckpt
from style_big_gan_tpu.utils import logging as log_utils
from style_big_gan_tpu.utils.conf import to_container
from style_big_gan_tpu.utils.misc import (EasyDict, format_time,
                                          is_power_of_two, tree_size)


def enable_compilation_cache(path: str = "~/.cache/sbg_tpu_xla"):
    """Persistent XLA compile cache — first compiles are 20-40s on TPU;
    caching makes repeat runs start in seconds.

    TPU-only: XLA's CPU AOT cache entries embed host CPU features and
    reloading them on a slightly different host SIGILLs the process."""
    import os as _os
    try:
        if jax.default_backend() != "tpu":
            return
        p = _os.path.expanduser(path)
        _os.makedirs(p, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", p)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        print(f"compilation cache unavailable: {e}")


def setup_snapshot_image_grid(dataset, random_seed: int = 0,
                              gw: Optional[int] = None,
                              gh: Optional[int] = None):
    """Label-grouped image grid selection (reference: trainers.py:63-98)."""
    rnd = np.random.RandomState(random_seed)
    if gw is None:
        gw = np.clip(7680 // dataset.image_shape[1], 7, 32)
    if gh is None:
        gh = np.clip(4320 // dataset.image_shape[0], 4, 32)

    if not dataset.has_labels:
        all_indices = list(range(len(dataset)))
        rnd.shuffle(all_indices)
        grid_indices = [all_indices[i % len(all_indices)]
                        for i in range(gw * gh)]
    else:
        label_groups: Dict[Any, List[int]] = {}
        for idx in range(len(dataset)):
            label = tuple(dataset.get_details(idx).raw_label.flat[::-1])
            label_groups.setdefault(label, []).append(idx)
        label_order = sorted(label_groups.keys())
        grid_indices = []
        for y in range(gh):
            label = label_order[y % len(label_order)]
            indices = label_groups[label]
            grid_indices += [indices[x % len(indices)] for x in range(gw)]
            rnd.shuffle(indices)
    images, labels = zip(*[dataset[i] for i in grid_indices])
    return (gw, gh), np.stack(images), np.stack(labels)


def save_image_grid(img: np.ndarray, fname: str, drange, grid_size):
    """PNG grid writer, NHWC (reference: trainers.py:102-118)."""
    import PIL.Image
    lo, hi = drange
    img = np.asarray(img, dtype=np.float32)
    img = (img - lo) * (255 / (hi - lo))
    img = np.rint(img).clip(0, 255).astype(np.uint8)
    gw, gh = grid_size
    _n, h, w, c = img.shape
    img = img.reshape(gh, gw, h, w, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gh * h, gw * w, c)
    assert c in [1, 3]
    if c == 1:
        PIL.Image.fromarray(img[:, :, 0], "L").save(fname)
    else:
        PIL.Image.fromarray(img, "RGB").save(fname)


@jax.jit
def _normalize_u8(img_u8):
    """uint8 [0,255] -> float32 [-1,1] ON DEVICE.

    The reference converts on the GPU after the transfer
    (trainers.py:716: ``.to(device).to(torch.float32) / 127.5 - 1``);
    normalizing on the host instead quadruples the host->device bytes —
    measured as the dominant per-iteration cost on a tunneled chip
    (805 MB/cycle f32 vs 201 MB uint8 at 256px, batch 64, k=4)."""
    return img_u8.astype(jnp.float32) / 127.5 - 1.0


class _DeviceBatchPrefetcher:
    """Overlaps host decode + host->device transfer with device compute.

    One background thread assembles the next (real, real_c, gen_c) batch,
    ships the images as uint8 and dispatches the on-device normalize; at
    most one prepared batch is held ahead (HBM cost: one extra stacked
    batch).  JAX dispatch is thread-safe; batch order is unchanged (a
    single worker pulls the host iterator sequentially)."""

    def __init__(self, make_batch):
        self._make = make_batch
        self._q: "queue.Queue" = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            while not self._stop.is_set():
                batch = self._make()
                while not self._stop.is_set():
                    try:
                        self._q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:   # surface in the consumer thread
            self._exc = e
            try:
                self._q.put(None, timeout=1.0)
            except queue.Full:
                pass

    def get(self):
        batch = self._q.get()
        if batch is None and self._exc is not None:
            raise self._exc
        return batch

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)


@registries.trainers.add_to_registry("base")
class BaseTrainer:
    """reference: trainers.py:149-876."""

    def __init__(self):
        self.config = None
        self.args = None
        self.run_dir = None
        self.mesh = None
        self.collector = Collector()
        self.abort_fn = None
        self.progress_fn = None

    # ------------------------------------------------------ setup_arguments

    def setup_arguments(self, config) -> EasyDict:
        """Validate config -> flat args (reference: trainers.py:155-395)."""
        a = EasyDict()
        c = config
        a.num_devices = int(c.perf.devices)
        if a.num_devices <= 0:
            a.num_devices = len(jax.devices())
        if not is_power_of_two(a.num_devices):
            raise ValueError("--devices must be a power of two")
        a.model_parallel = int(getattr(c.perf, "model_parallel", 1))

        a.batch_size = int(c.gen.batch)
        a.batch_device = int(c.gen.batch_device)
        if a.batch_size <= 0:
            raise ValueError("gen.batch must be set")
        if a.batch_size % a.num_devices != 0:
            raise ValueError("batch must divide the device count")
        per_dev = a.batch_size // a.num_devices
        if a.batch_device <= 0:
            a.batch_device = per_dev   # one round, full per-device batch
        if a.batch_device > per_dev:
            a.batch_device = per_dev   # reference caps batch_gpu at per-GPU
        # Hard divisibility check (reference: trainers.py:200-204) — a silent
        # fallback here ran full per-device microbatches behind the user's
        # back, risking OOM.
        if per_dev % a.batch_device != 0:
            raise ValueError(
                f"gen.batch ({a.batch_size}) must be divisible by "
                f"gen.batch_device * devices "
                f"({a.batch_device} * {a.num_devices})")
        a.num_accum_rounds = per_dev // a.batch_device

        a.total_kimg = float(c.gen.kimg)   # fractional kimg OK (tiny test runs)
        a.kimg_per_tick = int(c.log.kimg_per_tick)
        a.snap = int(c.log.snap)
        a.seed = int(c.gen.seed)
        a.metrics = list(c.log.metrics)

        # Dataset probe (reference: trainers.py:234-240).
        dataset_name = str(c.data.dataset)
        ds_kwargs = dict(to_container(c.datasets_args[dataset_name]))
        ds_kwargs["path"] = str(c.data.dataset_path)
        if c.data.mirror:
            ds_kwargs["xflip"] = True
        if c.data.subset and int(c.data.subset) > 0:
            ds_kwargs["max_size"] = int(c.data.subset)
        dataset = registries.datasets[dataset_name](**ds_kwargs)
        a.dataset_name = dataset_name
        a.dataset_kwargs = ds_kwargs
        a.resolution = dataset.resolution
        a.img_channels = dataset.num_channels
        a.label_dim = dataset.label_dim if (c.data.cond or
                                            ds_kwargs.get("use_labels")) else 0
        if c.data.cond and not dataset.has_labels:
            raise ValueError("cond=True requires labeled dataset")
        del dataset

        a.generator = str(c.gen.generator)
        a.discriminator = str(c.gen.discriminator)
        # Validate names against the registries for a helpful error.
        _ = registries.generators[a.generator]
        _ = registries.discriminators[a.discriminator]
        _ = registries.losses[str(c.gen.loss)]
        _ = registries.losses_arch[str(c.gen.loss_arch)]
        a.gen_kwargs = dict(to_container(c.gens_args[a.generator]))
        a.disc_kwargs = dict(to_container(c.discs_args[a.discriminator]))
        a.loss = str(c.gen.loss)
        a.loss_arch = str(c.gen.loss_arch)
        a.loss_arch_kwargs = dict(to_container(
            c.losses_arch_args[a.loss_arch])) \
            if a.loss_arch in c.losses_arch_args else {}
        a.gen_regs = [(r, dict(to_container(c.gen_regs_all[r])))
                      for r in c.gen.gen_regs]
        a.disc_regs = [(r, dict(to_container(c.disc_regs_all[r])))
                       for r in c.gen.disc_regs]
        a.g_reg_interval = int(c.gen.g_reg_interval)
        a.d_reg_interval = int(c.gen.d_reg_interval)
        a.n_dis = int(c.gen.n_dis)
        a.optim_gen = str(c.gen.optim_gen)
        a.optim_gen_kwargs = dict(to_container(c.optim_gen_args[a.optim_gen]))
        a.optim_disc = str(c.gen.optim_disc)
        a.optim_disc_kwargs = dict(to_container(c.optim_disc_args[a.optim_disc]))

        # EMA (reference: trainers.py:290-297).
        a.use_ema = bool(c.ema.use_ema)
        a.ema_kimg = float(c.ema.kimg)
        a.ema_rampup = float(c.ema.ramp)
        if a.ema_rampup < 0:
            a.ema_rampup = None
        # BigGAN standing statistics (reference: biggan/layers.py:212-255).
        a.standing_stats = bool(getattr(c.ema, "standing_stats", False))
        a.standing_stats_batches = int(getattr(c.ema,
                                               "standing_stats_batches", 16))

        # ADA (reference: trainers.py:299-336).
        a.aug = str(c.aug.aug)
        a.aug_type = str(c.aug.aug_type)
        a.ada_target = None
        a.augment_p = 0.0
        a.augment_kwargs = None
        if a.aug != "noaug":
            spec = AUGPIPE_SPECS[str(c.aug.augpipe)]
            a.augment_kwargs = dict(spec)
            if a.aug == "ada":
                a.ada_target = float(c.aug.target) if float(c.aug.target) > 0 \
                    else 0.6
            elif a.aug == "fixed":
                if float(c.aug.p) < 0:
                    raise ValueError("aug=fixed requires aug.p")
                a.augment_p = float(c.aug.p)
            else:
                raise ValueError(f"Unknown aug mode {a.aug}")
        a.ada_interval = int(c.aug.ada_interval)
        a.ada_kimg = int(c.aug.ada_kimg)

        # Transfer / resume (reference: trainers.py:342-369).
        a.resume = str(c.trans.resume)
        a.resume_model = str(c.trans.resume_model)
        a.resume_dir = str(c.trans.resume_dir)
        a.freezed = int(c.trans.freezed)
        a.start_options = dict(cur_nimg=0, cur_tick=0, batch_idx=0)
        a.wandb_run_id = None
        a.recorded_dataloader = None
        if a.resume == "from_data":
            rd = a.resume_dir or str(c.log.output)
            opts = ckpt.load_json(os.path.join(rd, str(c.trans.args_name)))
            a.start_options = opts.get("start_options", a.start_options)
            # The loader the interrupted run actually used: the C++ sampler
            # (std::mt19937_64) and the Python one (np.RandomState) produce
            # DIFFERENT index streams, so an exact resume must replay the
            # same loader or the bit-identical-continuation guarantee is
            # silently void (advisor r4 finding).
            a.recorded_dataloader = opts.get("resolved_dataloader")
            # Continue the same wandb run on resume
            # (reference: trainers.py:449-460).
            a.wandb_run_id = opts.get("wandb_run_id")
            snaps = sorted(f for f in os.listdir(rd)
                           if f.startswith("network-snapshot-"))
            if snaps:
                a.resume_model = os.path.join(rd, snaps[-1])
        if a.resume not in ("noresume", "from_data") and not a.resume_model:
            # Named spec / URL / local path, through the one resolver
            # (reference: trainers.py:342-362 + dnnlib open_url).
            from style_big_gan_tpu.utils import resolver
            a.resume_model = resolver.resolve_resume_spec(a.resume)
        if a.resume not in ("noresume", "from_data"):
            # Transfer learning: faster ADA reaction + no EMA rampup
            # (reference: trainers.py:363-365).  NOT applied to from_data —
            # that is an exact continuation of the interrupted run (the
            # reference applied these to every resume, which bent the EMA
            # and ADA schedules of a mere continuation).
            a.ada_kimg = 100
            a.ema_rampup = None

        a.bf16 = bool(c.perf.bf16)
        a.donate = bool(getattr(c.perf, "donate", True))
        a.steps_per_dispatch = int(getattr(c.perf, "steps_per_dispatch", 1))
        a.wandb = bool(c.log.wandb)
        a.tensorboard = bool(getattr(c.log, "tensorboard", False))
        a.project = str(c.exp.project)
        a.name = str(c.exp.name) if c.exp.name != "???" else "run"
        a.outdir = str(c.log.output)

        self.config = config
        self.args = a
        return a

    # ----------------------------------------------------------- setup_logs

    def setup_logs(self):
        """Run dir + sinks (reference: trainers.py:400-476)."""
        a = self.args
        self.run_dir = log_utils.pick_run_dir(a.outdir, a.name)
        self.logger = log_utils.Logger(os.path.join(self.run_dir, "log.txt"))
        opts = dict(to_container(self.config))
        opts["start_options"] = a.start_options
        # Dataset-probed model geometry, needed by tools/loader.py to rebuild
        # the generator with the exact c_dim/resolution it was trained with
        # (the config alone doesn't say — label_dim comes from the dataset).
        opts["model_meta"] = dict(label_dim=int(a.label_dim),
                                  resolution=int(a.resolution),
                                  img_channels=int(a.img_channels))
        self.stats_jsonl = log_utils.StatsJsonl(
            os.path.join(self.run_dir, "stats.jsonl"))
        # resume_id continues the run resumed via trans.resume=from_data
        # (reference: trainers.py:449-460); the live run's id is persisted
        # into training_options.json so the NEXT resume finds it.
        self.wandb_run = log_utils.make_wandb(a.wandb, a.project, a.name,
                                              dict(to_container(self.config)),
                                              resume_id=a.wandb_run_id)
        if self.wandb_run is not None:
            opts["wandb_run_id"] = str(self.wandb_run.id)
        ckpt.save_json(os.path.join(self.run_dir, "training_options.json"),
                       opts)
        self.tb = log_utils.make_tensorboard(a.tensorboard, self.run_dir)
        print(f"Run dir: {self.run_dir}")

    # ----------------------------------------------------------- setup_mesh

    def setup_mesh(self):
        """Mesh over (data, model) axes — replaces distribute_torch
        (reference: trainers.py:479-496)."""
        a = self.args
        self.mesh = mesh_lib.make_mesh(a.num_devices, a.model_parallel)
        print(f"Device mesh: {dict(self.mesh.shape)}")
        # The axon-tunneled backend pays a one-time ~100s handshake on the
        # first device->host transfer; trigger it now on a side thread so it
        # overlaps with the setup compiles instead of stalling the first tick.
        import os as _os
        import threading

        if _os.environ.get("SBG_NO_WARM") != "1":
            def _warm():
                try:
                    float(jnp.asarray(jnp.zeros((), jnp.float32)) + 1.0)
                except Exception:
                    pass
            threading.Thread(target=_warm, daemon=True).start()

    def init_params(self):
        """Seeds + persistent compile cache (reference: trainers.py:499-513)."""
        a = self.args
        np.random.seed(a.seed)
        self.root_key = jax.random.PRNGKey(a.seed)
        enable_compilation_cache()

    # -------------------------------------------------------- setup_dataset

    def setup_dataset(self):
        """Dataset + per-host sharded infinite iterator
        (reference: trainers.py:517-530)."""
        a = self.args
        self.dataset = registries.datasets[a.dataset_name](**a.dataset_kwargs)
        loader_name = str(self.config.data.dataloader)
        from style_big_gan_tpu.data.native_loader import native_available
        if loader_name == "auto":
            # Default-when-available: the C++ zip/PNG/JPEG pipeline beats
            # the Python decode path by the largest margin at 512px+ where
            # decode bytes quadruple (BASELINE.md); NativeDataloader itself
            # falls back to the Python path for non-zip datasets.
            if a.resume == "from_data" and a.recorded_dataloader:
                # Exact resume replays the RECORDED loader: the C++ and
                # Python samplers draw different index streams, so 'auto'
                # must not re-resolve per-environment mid-trajectory.
                loader_name = str(a.recorded_dataloader)
                if loader_name == "native" and not native_available():
                    loader_name = "basic"
                    print("WARNING: exact resume recorded dataloader="
                          "'native' but the native library is unavailable "
                          "here; falling back to 'basic' — the data "
                          "sequence will DIVERGE from the interrupted run "
                          "(build it with: make -C native)")
            else:
                loader_name = "native" if native_available() else "basic"
            print(f"dataloader: auto -> {loader_name}")
        elif a.resume == "from_data" and a.recorded_dataloader and \
                loader_name != str(a.recorded_dataloader):
            print(f"WARNING: exact resume with dataloader={loader_name!r} "
                  f"but the interrupted run used "
                  f"{str(a.recorded_dataloader)!r}; the data sequence will "
                  f"DIVERGE from an uninterrupted run")
        # Persist the resolved name so the NEXT from_data resume can hold
        # the loader (and its sampler stream) fixed.
        topt = os.path.join(self.run_dir, "training_options.json")
        opts = ckpt.load_json(topt)
        opts["resolved_dataloader"] = loader_name
        ckpt.save_json(topt, opts)
        loader_kwargs = dict(to_container(
            self.config.dataloaders_args[loader_name]))
        loader = registries.dataloaders[loader_name](**loader_kwargs)
        host_batch = a.batch_size // jax.process_count()
        # Exact resume: fast-forward the index stream to where the
        # interrupted run's trainer had consumed it (batch_idx batches of
        # host_batch items each), so a resumed run sees the same data
        # sequence the uninterrupted run would have.
        start_item = int(a.start_options.get("batch_idx", 0)) * host_batch
        self.data_iter = loader(self.dataset, batch_size=host_batch,
                                shard=jax.process_index(),
                                num_shards=jax.process_count(),
                                seed=a.seed, start_item=start_item)
        print(f"Dataset: {self.dataset.name}  {len(self.dataset)} images  "
              f"{a.resolution}x{a.resolution}x{a.img_channels}  "
              f"labels={a.label_dim}")

    # ------------------------------------------------------- setup_networks

    def setup_networks(self):
        """Build modules + init params (reference: trainers.py:533-572)."""
        a = self.args
        common = dict(c_dim=a.label_dim, img_resolution=a.resolution,
                      img_channels=a.img_channels)
        gen_kwargs = dict(a.gen_kwargs)
        g_cls = registries.generators[a.generator]
        if bool(self.config.perf.remat) and \
                "remat" in getattr(g_cls, "__dataclass_fields__", {}):
            gen_kwargs["remat"] = True
        self.G = g_cls(**common, **gen_kwargs)
        disc_kwargs = dict(a.disc_kwargs)
        d_cls = registries.discriminators[a.discriminator]
        fields = getattr(d_cls, "__dataclass_fields__", {})
        if a.freezed >= 0 and "freeze_layers" in fields:
            # Freeze-D (reference: trainers.py:367-369).
            disc_kwargs["freeze_layers"] = a.freezed
        self.D = d_cls(**common, **disc_kwargs)

        k_g, k_d, k_n, self.root_key = jax.random.split(self.root_key, 4)
        init_batch = max(2, min(4, a.batch_device))
        z = jnp.zeros((init_batch, int(getattr(self.G, "z_dim", 128))),
                      jnp.float32)
        cvec = jnp.zeros((init_batch, a.label_dim), jnp.float32) \
            if a.label_dim > 0 else jnp.zeros((init_batch, 0), jnp.float32)
        img = jnp.zeros((init_batch, a.resolution, a.resolution,
                         a.img_channels), jnp.float32)
        g_vars = self.G.init({"params": k_g, "noise": k_n}, z, cvec)
        d_vars = self.D.init({"params": k_d}, img, cvec)
        self.params_g, self.g_state = split_vars(g_vars)
        self.params_d, self.d_state = split_vars(d_vars)
        # Module summary doubles as the startup smoke test
        # (reference: trainers.py:564-572, misc.print_module_summary).
        from style_big_gan_tpu.utils.summary import print_module_summary
        print_module_summary(self.params_g, f"G ({a.generator})")
        print_module_summary(self.params_d, f"D ({a.discriminator})")

        self._resume_payload = None
        if a.resume_model:
            print(f"Resuming from {a.resume_model}")
            payload = ckpt.load_pytree_raw(a.resume_model)
            self.params_g = ckpt.copy_params_and_buffers(
                payload.get("params_g", {}), self.params_g)
            self.g_state = ckpt.copy_params_and_buffers(
                payload.get("g_state", {}), self.g_state)
            self.params_d = ckpt.copy_params_and_buffers(
                payload.get("params_d", {}), self.params_d)
            self.d_state = ckpt.copy_params_and_buffers(
                payload.get("d_state", {}), self.d_state)
            self._resume_payload = payload

    # -------------------------------------------------- setup_augmentations

    def setup_augmentations(self):
        """ADA pipe + controller (reference: trainers.py:575-584)."""
        a = self.args
        self.augment_pipe = None
        self.ada_controller = None
        if a.augment_kwargs is not None:
            pipe_cls = registries.augmentations[a.aug_type]
            self.augment_pipe = pipe_cls(**a.augment_kwargs)
            if a.ada_target is not None:
                self.ada_controller = AdaController(
                    target=a.ada_target, interval=a.ada_interval,
                    kimg=a.ada_kimg, batch_size=a.batch_size)
                # Exact resume: replay the sign observations that were
                # pending (since the last p adjustment) at snapshot time.
                p = self._resume_payload
                if a.resume == "from_data" and p is not None and \
                        "ada_signs" in p:
                    self.ada_controller._signs = [
                        float(v) for v in np.atleast_1d(p["ada_signs"])]

    # ---------------------------------------------- setup_training_phases

    def setup_training_phases(self):
        """Lazy-reg optimizers + jitted steps + phase schedule
        (reference: trainers.py:601-633)."""
        a = self.args
        arch_cls = registries.losses_arch[a.loss_arch]
        self.loss_arch = arch_cls(**a.loss_arch_kwargs)
        loss_obj = registries.losses[a.loss]()
        self.gen_reg_objs = [registries.generator_regs[n](**kw)
                             for n, kw in a.gen_regs]
        self.dis_reg_objs = [registries.discriminator_regs[n](**kw)
                             for n, kw in a.disc_regs]
        self.loss_arch.initialize(self.G, self.D, loss_obj,
                                  self.gen_reg_objs, self.dis_reg_objs,
                                  self.augment_pipe)

        g_int = a.g_reg_interval if self.gen_reg_objs else 0
        d_int = a.d_reg_interval if self.dis_reg_objs else 0

        def make_opt(name, kwargs, reg_interval):
            factory = registries.optimizers[name](**kwargs)
            mb_ratio = (reg_interval / (reg_interval + 1)
                        if reg_interval > 0 else 1.0)
            return factory.make(mb_ratio)

        opt_g = make_opt(a.optim_gen, a.optim_gen_kwargs, g_int)
        opt_d = make_opt(a.optim_disc, a.optim_disc_kwargs, d_int)
        self.opt_g_tx, self.opt_d_tx = opt_g, opt_d

        # Steps-per-dispatch cycle (perf.steps_per_dispatch): k batches of
        # the [Dmain x n_dis + Gmain] schedule scanned inside one TPU
        # program.  Lazy regs fire as separate dispatches at window
        # granularity; Greg fuses into the cycle tail when its interval
        # equals k.
        self.cycle_k = int(getattr(a, "steps_per_dispatch", 1))
        if self.cycle_k > 1 and self.cycle_k % a.n_dis != 0:
            print(f"perf.steps_per_dispatch={self.cycle_k} must be a "
                  f"multiple of gen.n_dis ({a.n_dis}); falling back to "
                  "one step per dispatch")
            self.cycle_k = 1
        # Greg always dispatches separately: fusing the PPL double-backward
        # into the cycle program trips the axon backend's program-size
        # ceiling at 256px (StepBuilder supports the tail for backends
        # without the ceiling; see tests/test_cycle.py).
        self.cycle_greg_fused = False

        self.steps = StepBuilder(
            self.loss_arch, opt_g, opt_d,
            z_dim=int(getattr(self.G, "z_dim", 128)),
            num_accum_rounds=a.num_accum_rounds,
            g_reg_gain=float(g_int if g_int > 0 else 1.0),
            d_reg_gain=float(d_int if d_int > 0 else 1.0),
            fuse_g_reg=(g_int == 0), fuse_d_reg=(d_int == 0),
            donate=a.donate,
            data_sharding=mesh_lib.batch_sharding(self.mesh, 2),
            cycle_g_reg_tail=self.cycle_greg_fused, n_dis=a.n_dis)

        # Phase schedule (intervals in batches; G every n_dis batches).
        self.phases = []
        self.phases.append(EasyDict(name="Dmain", interval=1))
        if d_int > 0:
            self.phases.append(EasyDict(name="Dreg", interval=d_int))
        self.phases.append(EasyDict(name="Gmain", interval=a.n_dis))
        if g_int > 0:
            self.phases.append(EasyDict(name="Greg",
                                        interval=g_int * a.n_dis))

        # Train state on the mesh.
        k_state, self.root_key = jax.random.split(self.root_key)
        state = create_train_state(
            k_state, self.params_g, self.g_state, self.params_d, self.d_state,
            opt_g, opt_d, gen_regs=self.gen_reg_objs, ada_p=a.augment_p)
        if self._resume_payload is not None:
            p = self._resume_payload
            if "params_g_ema" in p:
                state = state.replace(params_g_ema=ckpt.copy_params_and_buffers(
                    p["params_g_ema"], state.params_g_ema))
            if "reg_state" in p and p["reg_state"]:
                state = state.replace(
                    reg_state=jax.tree_util.tree_map(
                        jnp.asarray, p["reg_state"]))
            if "ada_p" in p:
                state = state.replace(ada_p=jnp.asarray(p["ada_p"],
                                                        jnp.float32))
            # Exact continuation (v2 payloads, from_data only): restore the
            # optimizer moments, step counter, and training PRNG key so the
            # resumed trajectory is bit-identical to an uninterrupted run.
            # Transfer learning (named resume specs) intentionally starts
            # the optimizer fresh, like the reference (trainers.py:342-369).
            if a.resume == "from_data" and int(p.get("snapshot_version", 1)) >= 2:
                import flax.serialization as _ser
                rng = jnp.asarray(p["rng"], jnp.uint32)
                if jnp.issubdtype(state.rng.dtype, jax.dtypes.prng_key):
                    rng = jax.random.wrap_key_data(rng)
                try:
                    state = state.replace(
                        opt_g=_ser.from_state_dict(state.opt_g, p["opt_g"]),
                        opt_d=_ser.from_state_dict(state.opt_d, p["opt_d"]),
                        step=jnp.asarray(p["step"], jnp.int32),
                        rng=rng)
                except (KeyError, ValueError) as e:
                    print(f"Snapshot optimizer state not restored ({e}); "
                          "resuming with fresh optimizer moments")
        if a.model_parallel > 1:
            # Tensor parallel: named targets (mapping FC stack, widest conv
            # kernels) plus any >= TP_MIN_SHARD_SIZE leaf sharded on the
            # output-channel axis over the 'model' mesh axis; optimizer
            # moments and EMA copies follow their params path-wise.  GSPMD
            # inserts the activation collectives.  Same rule + threshold as
            # the driver dryrun (docs/parallelism.md).
            self.state = mesh_lib.apply_shardings(
                state, mesh_lib.infer_state_sharding(state, self.mesh))
        else:
            self.state = mesh_lib.replicate_tree(self.mesh, state)

    # --------------------------------------------------------- persistence

    def save_snapshot(self, cur_nimg: int):
        """msgpack snapshot (reference: trainers.py:636-656).

        Version 2 payloads additionally carry the optimizer moments, the
        training PRNG key, the step counter, and the ADA controller's
        pending sign observations, making ``trans.resume=from_data`` an
        EXACT continuation (bit-identical to an uninterrupted run; see
        tests/test_exact_resume.py).  The reference's pickles drop all of
        these (trainers.py:636-656) — resume there re-warms Adam moments.
        Version-1 payloads still load (optimizer state starts fresh)."""
        import flax.serialization as _ser
        state = self.state
        payload = dict(
            snapshot_version=np.int32(2),
            params_g=jax.device_get(state.params_g),
            g_state=jax.device_get(state.g_state),
            params_d=jax.device_get(state.params_d),
            d_state=jax.device_get(state.d_state),
            params_g_ema=jax.device_get(state.params_g_ema),
            g_state_ema=jax.device_get(state.g_state_ema),
            reg_state=jax.device_get(state.reg_state),
            ada_p=jax.device_get(state.ada_p),
            opt_g=_ser.to_state_dict(jax.device_get(state.opt_g)),
            opt_d=_ser.to_state_dict(jax.device_get(state.opt_d)),
            step=jax.device_get(state.step),
            rng=jax.device_get(
                jax.random.key_data(state.rng)
                if jnp.issubdtype(state.rng.dtype, jax.dtypes.prng_key)
                else state.rng),
            ada_signs=np.asarray(
                self.ada_controller._signs
                if self.ada_controller is not None else [], np.float32),
        )
        path = os.path.join(self.run_dir, ckpt.snapshot_name(cur_nimg))
        ckpt.save_pytree(path, payload)
        return path

    def _update_training_options(self, cur_nimg, cur_tick, batch_idx):
        """reference: trainers.py:826-832."""
        path = os.path.join(self.run_dir, "training_options.json")
        opts = ckpt.load_json(path)
        opts["start_options"] = dict(cur_nimg=int(cur_nimg),
                                     cur_tick=int(cur_tick),
                                     batch_idx=int(batch_idx))
        ckpt.save_json(path, opts)

    def _refresh_standing_stats(self):
        """BigGAN eval-time standing statistics: reset + re-accumulate the
        G_ema BN standing sums before snapshot eval (reference myBN
        accumulate_standing, biggan/layers.py:212-255).  No-op unless
        ema.standing_stats is set and the generator supports it."""
        a = self.args
        if not getattr(a, "standing_stats", False):
            return
        import inspect
        if "standing_stats" not in \
                inspect.signature(type(self.G).__call__).parameters:
            if not getattr(self, "_warned_standing", False):
                print(f"ema.standing_stats ignored: generator "
                      f"{a.generator} has no standing-stats support")
                self._warned_standing = True
            return
        from style_big_gan_tpu.models.biggan import accumulate_standing_stats
        g_vars = merge_vars(self.state.params_g_ema, self.state.g_state_ema)
        new_vars = accumulate_standing_stats(
            self.G, g_vars, jax.random.PRNGKey(a.seed),
            num_batches=a.standing_stats_batches,
            batch_size=min(a.batch_size, 64))
        _, g_state_ema = split_vars(new_vars)
        self.state = self.state.replace(g_state_ema=g_state_ema)

    # ----------------------------------------------------------- inference

    def generate_images_ema(self, batch_size: int, rng: np.random.RandomState,
                            labels: Optional[np.ndarray] = None,
                            truncation_psi: float = 1.0):
        """uint8 NHWC rollout from G_ema (device-resident jax array)."""
        a = self.args
        z = jnp.asarray(rng.randn(batch_size,
                                  int(getattr(self.G, "z_dim", 128))),
                        jnp.float32)
        if labels is None:
            if a.label_dim > 0:
                idx = rng.randint(len(self.dataset), size=batch_size)
                labels = np.stack([self.dataset.get_label(int(i))
                                   for i in idx])
            else:
                labels = np.zeros((batch_size, 0), np.float32)
        c = jnp.asarray(labels, jnp.float32)
        # Keep params on device — no host round-trip per batch.
        g_vars = merge_vars(self.state.params_g_ema, self.state.g_state_ema)
        img = self._ema_apply(g_vars, z, c, truncation_psi)
        # The result STAYS on device: the metric feature loop feeds it
        # straight into a jitted detector, and a host round-trip through
        # the axon tunnel is ~5x slower than the detector itself
        # (benchmarks/bench_metrics.py).  Host-side callers np.asarray().
        from style_big_gan_tpu.tools.loader import images_to_uint8_device
        return images_to_uint8_device(img)

    def _ema_apply(self, g_vars, z, c, truncation_psi):
        if not hasattr(self, "_ema_apply_fn"):
            import inspect
            sig = inspect.signature(type(self.G).__call__)
            has_trunc = "truncation_psi" in sig.parameters

            if has_trunc:
                def fn(v, z, c, psi):
                    return self.G.apply(v, z, c, truncation_psi=psi,
                                        noise_mode="const",
                                        rngs={"noise": jax.random.PRNGKey(0)})
            else:
                def fn(v, z, c, psi):
                    return self.G.apply(v, z, c, train=False,
                                        rngs={"noise": jax.random.PRNGKey(0)})
            # psi is static: MappingNetwork short-circuits the truncation
            # lerp in Python when psi == 1.0 (few distinct values -> few
            # compiles, and the common psi=1.0 path stays lerp-free).
            self._ema_apply_fn = jax.jit(fn, static_argnums=(3,))
        return self._ema_apply_fn(g_vars, z, c, float(truncation_psi))

    def export_sample_images(self, cur_nimg: Optional[int] = None,
                             grid=None):
        """Image grid PNGs (reference: trainers.py:677-696)."""
        a = self.args
        if grid is None:
            if not hasattr(self, "_grid"):
                gw, gh = [int(v) for v in
                          getattr(self.config.log, "sample_grid", [0, 0])]
                self._grid = setup_snapshot_image_grid(
                    self.dataset, gw=gw or None, gh=gh or None)
                gs, images, labels = self._grid
                save_image_grid(images, os.path.join(self.run_dir,
                                                     "reals.png"),
                                drange=[0, 255], grid_size=gs)
            grid = self._grid
        gs, _images, labels = grid
        n = labels.shape[0]
        rng = np.random.RandomState(a.seed)
        out = []
        # HBM-aware chunking: the EMA forward holds full-resolution
        # activation pyramids, so cap the per-dispatch batch by pixel
        # count (64 was safe at 512px on a 16G-HBM chip; scale down from
        # there — at 1024px this is 16).  Pad the tail chunk to the same
        # shape so the jitted apply compiles exactly once.
        res = int(getattr(self.G, "img_resolution", 256))
        bs = min(64, n, max(4, (64 * 512 * 512) // (res * res)))
        for i in range(0, n, bs):
            lab = labels[i:i + bs]
            take = lab.shape[0]
            if a.label_dim == 0:
                lab = np.zeros((take, 0), np.float32)
            if take < bs:
                pad = np.repeat(lab[-1:], bs - take, axis=0)
                lab = np.concatenate([lab, pad], axis=0)
            imgs = np.asarray(self.generate_images_ema(bs, rng, labels=lab))
            out.append(imgs[:take])
        fakes = np.concatenate(out, axis=0)
        tag = "init" if cur_nimg is None else f"{cur_nimg // 1000:06d}"
        save_image_grid(fakes.astype(np.float32) / 127.5 - 1.0,
                        os.path.join(self.run_dir, f"fakes{tag}.png"),
                        drange=[-1, 1], grid_size=gs)

    def evaluate_metrics(self, cur_nimg: int, snapshot_path=None):
        """reference: trainers.py:659-674."""
        from style_big_gan_tpu.metrics import metric_main
        a = self.args
        results = {}
        for metric in a.metrics:
            if not metric_main.is_valid_metric(metric):
                print(f"Skipping unknown metric {metric}")
                continue
            rng = np.random.RandomState(a.seed)

            def g_sampler(batch_size, rng=rng, **kw):
                return self.generate_images_ema(batch_size, rng)

            g_kwargs = {}
            if metric.startswith("ppl"):
                from style_big_gan_tpu.metrics.ppl_sampler import PPLSampler
                try:
                    g_kwargs["ppl_sampler"] = PPLSampler(
                        self.G, merge_vars(self.state.params_g_ema,
                                           self.state.g_state_ema),
                        dataset=self.dataset)
                except ValueError as e:
                    print(f"Metric {metric} skipped: {e}")
                    continue

            # ValueError covers metric config errors (e.g. a ppl* metric on
            # a sampler-less G) — a bad metric list must not kill training.
            try:
                res = metric_main.calc_metric(
                    metric, G=g_sampler, G_kwargs=g_kwargs,
                    dataset=self.dataset,
                    dataset_kwargs=a.dataset_kwargs,
                    detector=str(getattr(self.config.log, "detector",
                                         "fake_v1")),
                    detector_path=(getattr(self.config.log, "detector_path",
                                           None) or None))
                metric_main.report_metric(res, run_dir=self.run_dir,
                                          snapshot_path=snapshot_path)
                for k, v in res.results.items():
                    results[f"Metrics/{k}"] = v
                    self.collector.report(f"Metrics/{k}", v)
            except (FileNotFoundError, ValueError) as e:
                print(f"Metric {metric} skipped: {e}")
        return results

    # -------------------------------------------------------- training_loop

    def _ema_beta(self, cur_nimg: int) -> float:
        """reference: trainers.py:752-761.

        The g_step update is `ema + (p - ema) * (1 - beta)` in reference
        terms, i.e. our beta is the RETENTION of the old average: beta=0
        copies the current params (no averaging), beta->1 is a long memory.
        With use_ema off, G_ema must track G exactly -> 0.0 (a 1.0 here
        froze G_ema at initialization: every snapshot/grid/metric of a
        use_ema=false config evaluated the random-init generator)."""
        a = self.args
        if not a.use_ema:
            return 0.0
        ema_nimg = a.ema_kimg * 1000
        if a.ema_rampup is not None:
            ema_nimg = min(ema_nimg, cur_nimg * a.ema_rampup)
        return 0.5 ** (a.batch_size / max(ema_nimg, 1e-8))

    def _sample_gen_labels(self, n: int, batch_idx: int = 0) -> np.ndarray:
        a = self.args
        if a.label_dim == 0:
            return np.zeros((n, 0), np.float32)
        # Deterministic per-batch label stream keyed on (seed, batch_idx,
        # process): exact resume replays the same generator-conditioning
        # labels (a global np.random draw would depend on process history),
        # and mixing in jax.process_index() keeps multi-host conditional
        # runs from drawing num_hosts duplicated label sets per global
        # batch (advisor r4 finding).
        rnd = np.random.RandomState(
            (a.seed * 1000003 + batch_idx * jax.process_count()
             + jax.process_index()) % (2**31 - 1))
        idx = rnd.randint(len(self.dataset), size=n)
        return np.stack([self.dataset.get_label(int(i)) for i in idx])

    def _flush_pending_stats(self):
        """Fetch deferred device-side phase stats into the collector."""
        if not self._pending_stats:
            return
        host = jax.device_get(self._pending_stats)
        self._pending_stats = []
        for stats in host:
            self.collector.report_dict(stats)
            if self.ada_controller is not None and \
                    "Loss/signs/real" in stats:
                # cycle dispatches return (k,)-stacked stats: one
                # observation per batch either way
                for v in np.atleast_1d(stats["Loss/signs/real"]):
                    self.ada_controller.observe(float(v))

    def training_loop(self):
        """The hot loop (reference: trainers.py:699-876)."""
        a = self.args
        mesh = self.mesh
        self._pending_stats = []
        # Host copy of the ADA probability follows the (possibly resumed)
        # device state — reading a.augment_p here made a resumed run's
        # next adjustment jump back to the config's initial p.
        self._ada_p_host = float(jax.device_get(self.state.ada_p))
        start_opts = a.start_options
        cur_nimg = int(start_opts.get("cur_nimg", 0))
        cur_tick = int(start_opts.get("cur_tick", 0))
        batch_idx = int(start_opts.get("batch_idx", 0))
        total_nimg = int(a.total_kimg * 1000)
        tick_start_nimg = cur_nimg
        tick_start_time = time.time()
        start_time = tick_start_time
        maintenance_time = 0.0

        t_img = time.time()
        self.export_sample_images(None)
        print(f"[setup] initial image grid done ({time.time() - t_img:.1f}s)")
        print(f"Training for {a.total_kimg} kimg "
              f"(batch {a.batch_size}, {a.num_devices} devices, "
              f"{a.num_accum_rounds} accum rounds)...")
        print()

        cycle_k = int(getattr(self, "cycle_k", 1))
        # Position of the NEXT batch the prefetch thread will assemble
        # (mutable cell: the thread runs ahead of consumption, but
        # sequentially, so this tracks the trainer's batch_idx stream).
        fetch_pos = [batch_idx]

        def fetch_device_batch():
            """Assemble + ship ONE device batch (runs on the prefetch
            thread; reference: trainers.py:712-722).  Images cross the
            host->device link as uint8 and are normalized on device."""
            pos = fetch_pos[0]
            fetch_pos[0] = pos + cycle_k
            if cycle_k > 1:
                pairs = [next(self.data_iter) for _ in range(cycle_k)]
                img_u8 = np.stack([p[0] for p in pairs])
                labels = np.stack([p[1] for p in pairs])
            else:
                img_u8, labels = next(self.data_iter)
            real_c = labels.astype(np.float32)
            if a.label_dim > 0 and \
                    real_c.shape[-1] != a.label_dim:
                raise ValueError("label shape mismatch")
            if a.label_dim == 0:
                real_c = np.zeros(img_u8.shape[:-3] + (0,), np.float32)
            gen_c = self._sample_gen_labels(
                int(np.prod(img_u8.shape[:-3])), batch_idx=pos)
            if cycle_k > 1:
                # explicit batch dim: -1 cannot be inferred when
                # label_dim == 0 (size-0 array)
                gen_c = gen_c.reshape(cycle_k, img_u8.shape[1],
                                      gen_c.shape[-1])
                u8_d, real_c_d, gen_c_d = mesh_lib.shard_stacked_batch(
                    mesh, (img_u8, real_c, gen_c))
            else:
                u8_d, real_c_d, gen_c_d = mesh_lib.shard_batch(
                    mesh, (img_u8, real_c, gen_c))
            return _normalize_u8(u8_d), real_c_d, gen_c_d

        prefetcher = _DeviceBatchPrefetcher(fetch_device_batch)
        try:
            self._training_loop_body(prefetcher, cycle_k, cur_nimg, cur_tick,
                                     batch_idx, total_nimg, tick_start_nimg,
                                     tick_start_time, start_time,
                                     maintenance_time)
        finally:
            prefetcher.close()

    def _training_loop_body(self, prefetcher, cycle_k, cur_nimg, cur_tick,
                            batch_idx, total_nimg, tick_start_nimg,
                            tick_start_time, start_time, maintenance_time):
        a = self.args

        while True:
            # ----- next device-resident batch (prepared one step ahead)
            t0 = time.time()
            real_img_d, real_c_d, gen_c_d = prefetcher.get()
            self.collector.report("Timing/data_fetch", time.time() - t0)

            # ----- profiler capture window (reference: record_function
            # ranges, trainers.py:714-744; here one jax.profiler trace)
            trace_dir = getattr(self.config.perf, "trace_dir", "")
            if trace_dir and batch_idx <= 10 < batch_idx + cycle_k:
                jax.profiler.start_trace(str(trace_dir))
            if trace_dir and batch_idx <= 20 < batch_idx + cycle_k:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {trace_dir}")

            # ----- phases (reference: trainers.py:725-748).  Stats stay as
            # device arrays here — fetching them per phase would sync the
            # device queue every batch; they are flushed at tick boundaries
            # (and before each ADA adjustment).
            if cycle_k > 1:
                # One scanned [Dmain+Gmain]x k program; lazy regs fire once
                # per due batch in the window (position within the window is
                # cycle-granular — the firing *rate* matches the reference
                # schedule exactly).
                betas = jnp.asarray(
                    [self._ema_beta(cur_nimg + i * a.n_dis * a.batch_size)
                     for i in range(cycle_k // a.n_dis)], jnp.float32)
                t1 = time.time()
                self.state, stats, reg_stats = self.steps.cycle_step(
                    self.state, real_img_d, real_c_d, gen_c_d, betas)
                self._pending_stats.append(stats)
                if reg_stats:
                    self._pending_stats.append(reg_stats)
                self.collector.report("Timing/cycle_dispatch",
                                      time.time() - t1)
                due = {name: [
                    i - batch_idx for i in range(batch_idx,
                                                 batch_idx + cycle_k)
                    if i % interval == 0]
                    for name, interval in ((p.name, p.interval)
                                           for p in self.phases)
                    if name in ("Dreg", "Greg")}
                for j in due.get("Dreg", []):
                    t1 = time.time()
                    self.state, stats = self.steps.d_reg_step(
                        self.state, real_img_d[j], real_c_d[j],
                        gen_c_d[j])
                    self._pending_stats.append(stats)
                    self.collector.report("Timing/Dreg_dispatch",
                                          time.time() - t1)
                if not self.cycle_greg_fused:
                    for j in due.get("Greg", []):
                        t1 = time.time()
                        self.state, stats = self.steps.g_reg_step(
                            self.state, gen_c_d[j])
                        self._pending_stats.append(stats)
                        self.collector.report("Timing/Greg_dispatch",
                                              time.time() - t1)
            else:
                ema_beta = self._ema_beta(cur_nimg)
                for phase in self.phases:
                    if batch_idx % phase.interval != 0:
                        continue
                    t1 = time.time()
                    if phase.name == "Dmain":
                        self.state, stats = self.steps.d_step(
                            self.state, real_img_d, real_c_d, gen_c_d)
                    elif phase.name == "Dreg":
                        self.state, stats = self.steps.d_reg_step(
                            self.state, real_img_d, real_c_d, gen_c_d)
                    elif phase.name == "Gmain":
                        self.state, stats = self.steps.g_step(
                            self.state, gen_c_d, ema_beta)
                    elif phase.name == "Greg":
                        self.state, stats = self.steps.g_reg_step(
                            self.state, gen_c_d)
                    self._pending_stats.append(stats)
                    self.collector.report(f"Timing/{phase.name}_dispatch",
                                          time.time() - t1)

            # ----- ADA p adjustment (reference: trainers.py:768-771).
            # With cycle_k > 1 the adjustment fires on interval-boundary
            # crossings; the controller scales the step by the number of
            # observed batches, so the adjustment *rate* is unchanged.
            if self.ada_controller is not None and batch_idx > 0 and \
                    (batch_idx + cycle_k - 1) // a.ada_interval > \
                    (batch_idx - 1) // a.ada_interval:
                self._flush_pending_stats()
                new_p = self.ada_controller.adjust(self._ada_p_host)
                if new_p is not None:
                    self._ada_p_host = new_p
                    self.state = self.state.replace(
                        ada_p=jnp.asarray(new_p, jnp.float32))
            self.collector.report("Progress/augment", self._ada_p_host)

            cur_nimg += a.batch_size * cycle_k
            batch_idx += cycle_k

            # ----- per-tick upkeep (reference: trainers.py:775-876)
            done = cur_nimg >= total_nimg
            if (not done) and cur_nimg < tick_start_nimg + \
                    a.kimg_per_tick * 1000:
                continue

            # Hard sync + flush the deferred stats (one device round-trip
            # per tick instead of one per phase).
            self._flush_pending_stats()
            int(jax.device_get(self.state.step))
            tick_end_time = time.time()
            tick_time = tick_end_time - tick_start_time
            kimg_done = (cur_nimg - tick_start_nimg) / 1000
            self.collector.update()
            col = self.collector
            fields = []
            fields.append(f"tick {cur_tick:<5d}")
            fields.append(f"kimg {cur_nimg / 1000:<8.1f}")
            fields.append(f"time {format_time(tick_end_time - start_time):<12s}")
            fields.append(f"sec/tick {tick_time:<7.1f}")
            fields.append(f"sec/kimg {tick_time / max(kimg_done, 1e-8):<7.2f}")
            fields.append(f"maintenance {maintenance_time:<6.1f}")
            fields.append(f"augment {col.mean('Progress/augment'):.3f}")
            fields.append(f"G/loss {col.mean('Loss/G/loss'):.3f}")
            fields.append(f"D/loss {col.mean('Loss/D/loss'):.3f}")
            print(" ".join(fields))

            # progress + abort hooks (reference: trainers.py:801-805)
            if self.progress_fn is not None:
                self.progress_fn(cur_nimg // 1000, a.total_kimg)
            aborted = self.abort_fn is not None and self.abort_fn()

            t_maint = time.time()
            snapshot_path = None
            if cur_tick % a.snap == 0 or done or aborted:
                self._refresh_standing_stats()
                self.export_sample_images(cur_nimg)
                snapshot_path = self.save_snapshot(cur_nimg)
                self._update_training_options(cur_nimg, cur_tick, batch_idx)
                if a.metrics:
                    self.evaluate_metrics(cur_nimg, snapshot_path)

            # sinks (reference: trainers.py:850-866)
            scalar_stats = {name: col.mean(name) for name in col.names()}
            scalar_stats["Progress/kimg"] = cur_nimg / 1000
            scalar_stats["Progress/tick"] = cur_tick
            scalar_stats["Timing/sec_per_tick"] = tick_time
            scalar_stats["Timing/sec_per_kimg"] = \
                tick_time / max(kimg_done, 1e-8)
            scalar_stats["Timing/total_hours"] = \
                (tick_end_time - start_time) / 3600
            self.stats_jsonl.write(scalar_stats)
            if self.tb is not None:
                for k, v in scalar_stats.items():
                    self.tb.add_scalar(k, v, global_step=cur_nimg)
            if self.wandb_run is not None:
                self.wandb_run.log(scalar_stats, step=cur_nimg)

            maintenance_time = time.time() - t_maint
            cur_tick += 1
            tick_start_nimg = cur_nimg
            tick_start_time = time.time()
            if done or aborted:
                break

        print()
        print("Exiting...")

    # -------------------------------------------------------------- driver

    def run(self, config):
        """Full pipeline: all stages then the loop (reference: starter.py +
        multiprocesses_main collapsed into one SPMD process)."""
        self.setup_arguments(config)
        if bool(config.exp.dry_run):
            print("Dry run OK; exiting.")
            return
        t0 = time.time()

        def stage(name, fn):
            fn()
            print(f"[setup] {name} done ({time.time() - t0:.1f}s)")

        stage("logs", self.setup_logs)
        stage("mesh", self.setup_mesh)
        stage("params", self.init_params)
        stage("dataset", self.setup_dataset)
        stage("networks", self.setup_networks)
        stage("augmentations", self.setup_augmentations)
        stage("training_phases", self.setup_training_phases)
        self.training_loop()


@registries.trainers.add_to_registry("sg2")
class SG2Trainer(BaseTrainer):
    """StyleGAN2 trainer (reference: trainers.py:881-893).  The only
    reference difference — splitting G into mapping/synthesis DDP groups —
    is unnecessary under SPMD; loss-arch 'sg2' provides the mapping/synthesis
    decomposition for style mixing and PPL."""
    pass
