"""Training runtime: one jitted SPMD train step + the host-side TrainLoop.

TPU-native redesign of /root/reference/improved_diffusion/train_util.py:

* the hot path is ONE jitted function: loss → grad → AdamW → EMA, with
  gradient accumulation as a ``lax.scan`` over microbatches. Params are
  replicated and the batch is sharded over the mesh 'data' axis; XLA inserts
  the gradient reductions (replacing DDP/NCCL allreduce, train_util.py:133-151);
* mask sampling runs host-side in the input path (training/masks.py) so the
  device only sees static (B, max_frames, ...) shapes;
* bf16 compute / f32 params replaces fp16 loss scaling (optimize_fp16,
  train_util.py:507-523) — non-finite grads still skip the step;
* EMA is a pure tree update inside the step (nn.update_ema);
* LR: the reference constructs CosineAnnealingWarmRestarts(period=iterations)
  AND a linear anneal; the linear anneal wins when lr_anneal_steps>0 because
  it is applied immediately before opt.step() (train_util.py:539-545, :118).
  We reproduce that effective behavior.
"""

import copy
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.nn import update_ema
from ..models.wrappers import make_video_model_fn
from ..parallel import mesh as mesh_lib
from ..training.masks import MaskSampler, make_interesting_masks
from ..training.resample import LossAwareSampler, UniformSampler
from ..utils import checkpoint as ckpt_lib
from ..utils import logger
from ..utils.rng import RNG


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    opt_state: tuple
    ema_params: tuple  # one tree per EMA rate


def make_lr_schedule(lr, iterations, lr_anneal_steps=0):
    """Effective reference LR behavior (see module docstring)."""

    def schedule(step):
        if lr_anneal_steps:
            return lr * (1.0 - step / lr_anneal_steps)
        t = jnp.mod(step, iterations) / iterations
        return lr * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return schedule


def make_optimizer(lr, weight_decay, iterations, lr_anneal_steps=0):
    return optax.adamw(
        learning_rate=make_lr_schedule(lr, iterations, lr_anneal_steps),
        weight_decay=weight_decay,
    )


def build_train_step(
    model,
    diffusion,
    optimizer,
    ema_rates,
    observed_frames,
    pad_with_random_frames,
    num_microbatches=1,
):
    """Build the jitted train step.

    batch dict fields (all leading dim B, already mask-gathered):
      x (B,N,H,W,C), frame_indices (B,N), obs_mask/latent_mask/kinda_marg_mask
      (B,N,1,1,1), t (B,), weights (B,).
    Returns (new_state, metrics) where metrics carries per-example loss terms
    for quartile logging and the grad norm.
    """

    def loss_fn(params, batch, rng):
        x = batch["x"]
        loss_mask = (
            (1 - batch["obs_mask"] - batch["kinda_marg_mask"])
            if pad_with_random_frames
            else batch["latent_mask"]
        )
        drng, lrng = jax.random.split(rng)
        model_fn = make_video_model_fn(
            model,
            {"params": params},
            diffusion,
            x0=x,
            obs_mask=batch["obs_mask"],
            latent_mask=batch["latent_mask"],
            kinda_marg_mask=batch["kinda_marg_mask"],
            frame_indices=batch["frame_indices"],
            observed_frames=observed_frames,
            train=True,
            dropout_rng=drng,
        )
        terms = diffusion.training_losses(
            model_fn,
            x,
            batch["t"],
            lrng,
            latent_mask=loss_mask,
            eval_mask=batch["latent_mask"],
            observed_frames=observed_frames,
        )
        loss = (terms["loss"] * batch["weights"]).mean()
        weighted = {k: v * batch["weights"] for k, v in terms.items()}
        return loss, weighted

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state, batch, rng):
        if num_microbatches > 1:
            # grad accumulation: scan over the microbatch axis
            mb = jax.tree_util.tree_map(
                lambda x: x.reshape((num_microbatches, -1) + x.shape[1:]), batch
            )
            rngs = jax.random.split(rng, num_microbatches)

            def body(acc, inp):
                b, r = inp
                (loss, terms), grads = grad_fn(state.params, b, r)
                acc = jax.tree_util.tree_map(jnp.add, acc, grads)
                return acc, (loss, terms)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            grads, (losses, terms) = jax.lax.scan(body, zero, (mb, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / num_microbatches, grads)
            loss = losses.mean()
            terms = jax.tree_util.tree_map(lambda x: x.reshape(-1), terms)
        else:
            (loss, terms), grads = grad_fn(state.params, batch, rng)

        grad_norm = optax.global_norm(grads)
        # skip the update on non-finite grads (reference optimize_fp16
        # NaN-skip semantics, train_util.py:507-511)
        grads_ok = jnp.isfinite(grad_norm)
        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(grads_ok, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt_state = optimizer.update(
            safe_grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_params, new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(grads_ok, new, old),
            (new_params, new_opt_state),
            (state.params, state.opt_state),
        )
        new_ema = tuple(
            update_ema(e, new_params, rate)
            for e, rate in zip(state.ema_params, ema_rates)
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        metrics = {"grad_norm": grad_norm, "skipped": ~grads_ok, **terms}
        return new_state, metrics

    return train_step


def should_sample(step, sample_interval):
    """Whether the training loop should log samples at ``step``.

    ``None`` or ``<=0`` disables in-training sampling entirely, INCLUDING
    the step-5 sanity sample (reference fires it unconditionally,
    train_util.py:296-300): a full unbounded reverse chain at 64x64
    exceeds the remote tunnel's ~60 s per-call deadline and kills the TPU
    worker mid-run (observed round 4). ``0 % interval`` would also raise.
    """
    if sample_interval is None or sample_interval <= 0:
        return False
    return step != 0 and (step % sample_interval == 0 or step == 5)


def resume_postfixes(main_checkpoint, step):
    """Ordered opt/EMA postfix candidates for a resume checkpoint: the one
    matching the resume file's own name first, the other as a fallback (a
    save can die between the three renames). Deriving this from the current
    run's save_latest_only flag instead is wrong: find_resume_checkpoint may
    pick the highest-step 'model_<step>.pt' (archiver-produced snapshots of a
    latest-only run) and the flag would then point at a nonexistent
    'opt_latest.pt'."""
    latest_first = os.path.basename(str(main_checkpoint)).endswith("_latest.pt")
    pf = ["latest", f"{step:06d}"]
    return pf if latest_first else pf[::-1]


class TrainLoop:
    """Host-side orchestration (reference train_util.TrainLoop)."""

    def __init__(
        self,
        *,
        model,
        diffusion,
        data,
        batch_size,
        microbatch,
        lr,
        ema_rate,
        log_interval,
        save_interval,
        resume_checkpoint,
        T,
        use_fp16=False,  # accepted for CLI parity; bf16 policy is in the model
        fp16_scale_growth=1e-3,
        schedule_sampler=None,
        weight_decay=0.0,
        lr_anneal_steps=0,
        sample_interval=None,
        iterations=1000000,
        do_inefficient_marg=True,
        n_valid_batches=1,
        n_valid_repeats=1,
        max_frames=10,
        n_interesting_masks=3,
        mask_distribution="differently-spaced-groups",
        pad_with_random_frames=True,
        observed_frames="x_t_minus_1",
        use_gradient_method=False,
        args=None,
        mesh=None,
        seed=0,
    ):
        del use_fp16, fp16_scale_growth, use_gradient_method
        assert args is not None
        self._args = args
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.batch_size = batch_size
        self.microbatch = microbatch if microbatch > 0 else batch_size
        assert batch_size % self.microbatch == 0
        self.num_microbatches = batch_size // self.microbatch
        self.lr = lr
        self.ema_rate = (
            [ema_rate]
            if isinstance(ema_rate, float)
            else [float(x) for x in str(ema_rate).split(",")]
        )
        self.T = T
        self.max_frames = max_frames
        self.log_interval = log_interval
        self.sample_interval = sample_interval
        self.save_interval = save_interval
        self.schedule_sampler = schedule_sampler or UniformSampler(diffusion)
        self.weight_decay = weight_decay
        self.lr_anneal_steps = lr_anneal_steps
        self.iterations = iterations
        self.observed_frames = observed_frames
        self.pad_with_random_frames = pad_with_random_frames
        self.n_valid_batches = n_valid_batches
        self.n_valid_repeats = n_valid_repeats
        self.n_interesting_masks = n_interesting_masks
        self._pending_metrics = None  # (metrics, t) of the not-yet-logged step
        self._prefetch_pool = None  # lazy ThreadPoolExecutor(1), _take_next_batch
        self._batch_future = None  # in-flight prefetched (batch, t, timings)
        self.mask_sampler = MaskSampler(
            mask_distribution=mask_distribution,
            max_frames=max_frames,
            pad_with_random_frames=pad_with_random_frames,
            do_inefficient_marg=do_inefficient_marg,
        )
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh()
        self.rng = np.random.default_rng(seed + 1000 * jax.process_index())
        self.jrng = jax.random.PRNGKey(seed)
        self.step = 0
        self.global_batch = self.batch_size * jax.process_count()

        self.resume_checkpoint = resume_checkpoint or ckpt_lib.find_resume_checkpoint(
            getattr(args, "resume_id", "")
        )

        # ---- init / resume params ------------------------------------- #
        self._init_state()

        self.optimizer = make_optimizer(
            lr, weight_decay, self.iterations, lr_anneal_steps
        )
        opt_state = self.optimizer.init(self.params)
        ema_params = tuple(
            copy.deepcopy(self.params) for _ in range(len(self.ema_rate))
        )
        if self.resume_checkpoint:
            opt_state, ema_params = self._load_opt_and_ema(opt_state, ema_params)

        self.state = TrainState(
            step=jnp.asarray(self.step, dtype=jnp.int32),
            params=self.params,
            opt_state=opt_state,
            ema_params=ema_params,
        )
        del self.params
        # replicate state over the mesh
        rep = mesh_lib.replicated_sharding(self.mesh)
        self.state = jax.device_put(self.state, rep)

        self._train_step = jax.jit(
            build_train_step(
                self.model,
                self.diffusion,
                self.optimizer,
                tuple(self.ema_rate),
                self.observed_frames,
                self.pad_with_random_frames,
                self.num_microbatches,
            ),
            donate_argnums=(0,),
        )

        with RNG(0):
            self.valid_batches = [
                np.asarray(next(self.data)[0][: self.batch_size])
                for _ in range(self.n_valid_batches)
            ]
        n_params = sum(
            p.size for p in jax.tree_util.tree_leaves(self.state.params)
        )
        logger.logkv("num_parameters", n_params)
        logger.log(f"num_parameters: {n_params}")

    # ------------------------------------------------------------------ #
    def _init_state(self):
        if self.resume_checkpoint:
            logger.log(f"loading model from checkpoint: {self.resume_checkpoint}...")
            data = ckpt_lib.load_checkpoint(self.resume_checkpoint)
            self.step = data["step"]
            self.params = jax.tree_util.tree_map(jnp.asarray, data["state_dict"])
            return
        sample = np.asarray(self.valid_init_batch())
        B = sample.shape[0]
        x = jnp.asarray(sample[:1, : self.max_frames])
        masks = jnp.zeros((1, x.shape[1], 1, 1, 1))
        fi = jnp.arange(x.shape[1])[None]
        t = jnp.zeros((1,), dtype=jnp.int32)
        init_rng, self.jrng = jax.random.split(self.jrng)
        variables = self.model.init(
            {"params": init_rng},
            x,
            self.diffusion.scale_timesteps(t),
            x0=x,
            obs_mask=masks,
            latent_mask=1 - masks,
            kinda_marg_mask=masks,
            frame_indices=fi,
            observed_frames="x_0",
        )
        self.params = variables["params"]

    def valid_init_batch(self):
        with RNG(12):
            return next(self.data)[0]

    def _load_opt_and_ema(self, opt_state, ema_params):
        main = self.resume_checkpoint
        postfixes = resume_postfixes(main, self.step)
        if str(main).endswith(".orbax"):
            # opt lives inside the composite; the initialized (sharded) opt
            # state is the restore target, so structure/dtype/sharding are
            # restored in place
            logger.log(f"loading optimizer state from checkpoint: {main}")
            opt_state = ckpt_lib.load_opt_state(main, target=opt_state)
        else:
            opt_paths = [
                os.path.join(os.path.dirname(main), f"opt_{p}.pt")
                for p in postfixes
            ]
            opt_path = next((p for p in opt_paths if os.path.exists(p)), None)
            if opt_path is None:
                raise FileNotFoundError(
                    f"Failed to find optimizer checkpoint (tried {opt_paths})"
                )
            logger.log(f"loading optimizer state from checkpoint: {opt_path}")
            loaded = ckpt_lib.load_opt_state(opt_path)
            opt_state = jax.tree_util.tree_map(
                lambda ref, x: jnp.asarray(x).astype(ref.dtype)
                if hasattr(ref, "dtype")
                else x,
                opt_state,
                loaded,
            )
        new_ema = []
        for rate in self.ema_rate:
            path = next(
                (
                    p
                    for p in (
                        ckpt_lib.find_ema_checkpoint(
                            main, self.step, rate, pf == "latest"
                        )
                        for pf in postfixes
                    )
                    if p is not None
                ),
                None,
            )
            if path is None:
                raise FileNotFoundError(
                    f"Failed to find EMA checkpoint for rate {rate}"
                )
            logger.log(f"loading EMA from checkpoint: {path}...")
            new_ema.append(
                jax.tree_util.tree_map(
                    jnp.asarray, ckpt_lib.load_checkpoint(path)["state_dict"]
                )
            )
        return opt_state, tuple(new_ema)

    # ------------------------------------------------------------------ #
    def _next_train_batch(self):
        """Draw data, sample masks host-side, build the device batch dict.

        Returns ``(device_batch, t_host, timings)``; the caller logs the
        phase timers (timing/data_wait, timing/mask_sample, timing/h2d) so
        this function stays safe to run on the prefetch worker thread (the
        kv logger is only ever touched from the main thread). With one host
        core, anything here gates the step rate once it exceeds the device
        step time — unless it runs on the prefetch thread, where it
        overlaps the main thread's blocking device waits (dispatch
        back-pressure and the metrics device_get release the GIL)."""
        t0 = time.time()
        batch1 = np.asarray(next(self.data)[0])
        batch2 = (
            np.asarray(next(self.data)[0]) if self.pad_with_random_frames else None
        )
        t1 = time.time()
        x, frame_indices, obs, latent, marg = self.mask_sampler.sample_all_masks(
            self.rng, batch1, batch2
        )
        t, weights = self.schedule_sampler.sample(x.shape[0], self.rng)
        batch = {
            "x": x.astype(np.float32, copy=False),
            "frame_indices": frame_indices,
            "obs_mask": obs,
            "latent_mask": latent,
            "kinda_marg_mask": marg,
            "t": t,
            "weights": weights,
        }
        t2 = time.time()
        device_batch = mesh_lib.shard_batch(batch, self.mesh)
        timings = {
            "timing/data_wait": t1 - t0,
            "timing/mask_sample": t2 - t1,
            "timing/h2d": time.time() - t2,
        }
        return device_batch, t, timings

    def _take_next_batch(self):
        """Return the next train batch, one-step prefetched on a worker
        thread (``VDT_PREFETCH=0`` opts out).

        The worker starts preparing batch N+1 as soon as batch N is taken,
        so the ~0.2 s of single-core host work per step (data draw, numpy
        mask sampling/gathers, device_put) runs while the main thread is
        blocked waiting on the device (those waits release the GIL). Draw
        order from ``self.rng``/``self.data`` is unchanged — the same
        single consumer executes the same code in the same order, just one
        step early — so the produced batch stream is bit-identical to the
        unprefetched loop (unit-tested). With a loss-aware schedule sampler
        the prefetched draw sees importance weights one step staler than
        the unprefetched loop would — the usual, benign cost of pipelining
        (the reference's CUDA-stream overlap has the same property)."""
        if os.environ.get("VDT_PREFETCH", "1") != "1":
            return self._next_train_batch()
        if self._prefetch_pool is None:
            import concurrent.futures

            self._prefetch_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="batch-prefetch"
            )
        fut = self._batch_future
        self._batch_future = None
        out = fut.result() if fut is not None else self._next_train_batch()
        self._batch_future = self._prefetch_pool.submit(self._next_train_batch)
        return out

    def run_step(self):
        # Software-pipelined: host-side batch prep (mask sampling, gathers)
        # for step N runs while the device executes step N-1; metrics of the
        # previous step are materialised only after step N is dispatched, so
        # `jax.device_get` never stalls an idle device. (The reference's
        # torch loop gets the same overlap implicitly from CUDA streams;
        # here the blocking device_get had been serialising host and TPU.)
        batch, t_host, timings = self._take_next_batch()
        for k, v in timings.items():
            logger.logkv_mean(k, v)
        self.jrng, step_rng = jax.random.split(self.jrng)
        t0 = time.time()
        self.state, metrics = self._train_step(self.state, batch, step_rng)
        # async dispatch: this measures enqueue + any back-pressure block,
        # i.e. the time the host is stalled *waiting for the device*
        logger.logkv_mean("timing/dispatch", time.time() - t0)
        if self._pending_metrics is not None:
            self._log_metrics(*self._pending_metrics)
        self._pending_metrics = (metrics, t_host, self.step)
        self.step += 1

    def _flush_metrics(self):
        if self._pending_metrics is not None:
            self._log_metrics(*self._pending_metrics)
            self._pending_metrics = None

    def run_loop(self):
        # jax profiler hook (SURVEY §5.1: the reference only has wall-time
        # kv timers; here VDT_PROFILE_DIR=<dir> captures a device trace of
        # steps [10, 20) viewable in tensorboard/xprof)
        profile_dir = os.environ.get("VDT_PROFILE_DIR", "")
        last_sample_time = time.time()
        while not self.lr_anneal_steps or self.step < self.lr_anneal_steps:
            if profile_dir and self.step == 10:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and self.step == 20:
                jax.profiler.stop_trace()
                logger.log(f"wrote profiler trace to {profile_dir}")
            if self.step >= self.iterations:
                break
            t_0 = time.time()
            self.run_step()
            logger.logkv("timing/step_time", time.time() - t_0)
            if self.step % self.log_interval == 0:
                self._flush_metrics()
                logger.dumpkvs()
            if self.step % self.save_interval == 0:
                self.save()
                if os.environ.get("DIFFUSION_TRAINING_TEST", "") and self.step > 0:
                    return
            if should_sample(self.step, self.sample_interval):
                self.log_samples()
                logger.logkv(
                    "timing/time_between_samples", time.time() - last_sample_time
                )
                last_sample_time = time.time()
        self._flush_metrics()
        if (self.step - 1) % self.save_interval != 0:
            self.save()
        # async (orbax) saves must commit before the process exits
        ckpt_lib.wait_for_checkpoints()

    # ------------------------------------------------------------------ #
    def _log_metrics(self, metrics, t_host, step=None):
        step = self.step if step is None else step
        t0 = time.time()
        metrics = jax.device_get(metrics)
        # blocks until the *previous* step finishes on device (the loop's
        # only sync point): device-bound runs show the device remainder
        # here, host-bound runs show ~tunnel RTT only
        logger.logkv_mean("timing/metrics_get", time.time() - t0)
        logger.logkv("step", step)
        lr = make_lr_schedule(self.lr, self.iterations, self.lr_anneal_steps)(
            step
        )
        logger.logkv("lr", float(lr))
        logger.logkv("samples", (step + 1) * self.global_batch)
        logger.logkv_mean("grad_norm", float(metrics.pop("grad_norm")))
        skipped = metrics.pop("skipped")
        if bool(np.asarray(skipped).any()):
            logger.log("Found non-finite grads; skipped optimizer step")
        if isinstance(self.schedule_sampler, LossAwareSampler):
            self.schedule_sampler.update_with_local_losses(
                t_host, np.asarray(metrics["loss"])
            )
        # per-quartile loss logging (reference train_util.py:956-963)
        for key, values in metrics.items():
            values = np.asarray(values)
            logger.logkv_mean(key, float(values.mean()))
            for sub_t, sub_loss in zip(np.asarray(t_host), values):
                quartile = int(4 * sub_t / self.diffusion.num_timesteps)
                logger.logkv_mean(f"{key}_q{quartile}", float(sub_loss))

    # ------------------------------------------------------------------ #
    def save(self):
        logdir = ckpt_lib.get_blob_logdir(self._run_id())
        if ckpt_lib.checkpoint_backend() == "orbax":
            # sharded async save: every process participates, live device
            # arrays are snapshotted without a host gather, and the commit
            # finishes in the background while training continues
            ckpt_lib.save_checkpoint_orbax(
                logdir,
                params=self.state.params,
                ema_params=list(self.state.ema_params),
                ema_rates=self.ema_rate,
                opt_state=self.state.opt_state,
                config=self._args.__dict__,
                step=self.step,
                save_latest_only=self._args.save_latest_only,
            )
            if jax.process_index() == 0:
                logger.log(
                    f"saving orbax checkpoint at step {self.step} to {logdir} "
                    "(async)"
                )
            return
        if jax.process_index() == 0:
            ckpt_lib.save_checkpoint(
                logdir,
                params=jax.device_get(self.state.params),
                ema_params=[jax.device_get(e) for e in self.state.ema_params],
                ema_rates=self.ema_rate,
                opt_state=jax.device_get(self.state.opt_state),
                config=self._args.__dict__,
                step=self.step,
                save_latest_only=self._args.save_latest_only,
            )
            logger.log(f"saved checkpoint at step {self.step} to {logdir}")

    def _run_id(self):
        rid = getattr(self._args, "resume_id", "")
        if rid:
            return rid
        wid = getattr(self._args, "_run_id", None)
        if wid is None:
            wid = os.environ.get("VDT_RUN_ID", time.strftime("run-%Y%m%d-%H%M%S"))
            self._args._run_id = wid
        return wid

    # ------------------------------------------------------------------ #
    def log_samples(self):
        """In-training sampling with EMA params and preset 'interesting'
        masks; logs rmse (reference train_util.py:632-756, trimmed: media
        sinks are handled by the logger when wandb is present)."""
        with RNG(0):
            sample_start = time.time()
            orig_batch = np.concatenate(self.valid_batches, axis=0)
            set_masks = make_interesting_masks(
                orig_batch.shape, self.max_frames, self.n_interesting_masks
            )
            rng = np.random.default_rng(0)
            x, fi, obs, latent, marg = self.mask_sampler.sample_all_masks(
                rng, orig_batch, None, set_masks=set_masks
            )
            x = jnp.asarray(x)

            def sample_fn(ema, x, obs_m, lat_m, marg_m, fi_m, r):
                model_fn = make_video_model_fn(
                    self.model,
                    {"params": ema},
                    self.diffusion,
                    x0=x,
                    obs_mask=obs_m,
                    latent_mask=lat_m,
                    kinda_marg_mask=marg_m,
                    frame_indices=fi_m,
                    observed_frames=self.observed_frames,
                )
                return self.diffusion.p_sample_loop(model_fn, x.shape, r)

            self.jrng, srng = jax.random.split(self.jrng)
            sample = jax.jit(sample_fn)(
                self.state.ema_params[0], x, jnp.asarray(obs),
                jnp.asarray(latent), jnp.asarray(marg), jnp.asarray(fi), srng,
            )
            sample = np.asarray(sample)
            error = np.asarray(latent) * (sample - np.asarray(x))
            rmse = float(
                np.sqrt((error**2).mean() / np.asarray(latent).mean())
            )
            logger.logkv("rmse", rmse)
            logger.logkv("timing/sampling_time", time.time() - sample_start)
            logger.log(f"sampling complete, rmse={rmse:.4f}")

            # media: reassemble samples/errors at their true frame positions
            # and log video grids (reference train_util.py:699-721)
            from ..utils import media

            x_np = np.asarray(x)
            marked = x_np.copy()
            media.mark_as_observed(marked)
            vis = sample * np.asarray(latent) + marked * np.asarray(obs)
            vis_all = np.zeros_like(orig_batch)
            error_all = np.zeros_like(orig_batch)
            for b in range(len(x_np)):
                is_any = ((latent + obs)[b, :, 0, 0, 0] > 0)
                idx = fi[b, is_any]
                vis_all[b, idx] = vis[b, is_any]
                lat_idx = fi[b, latent[b, :, 0, 0, 0] > 0]
                error_all[b, lat_idx] = error[b, latent[b, :, 0, 0, 0] > 0]
            media.gather_and_log_videos("sample/", vis_all, log_as="array")
            media.gather_and_log_videos("error/", error_all, log_as="array")

            # attention heatmaps from one mid-noise forward with capture
            try:
                t_mid = jnp.full(
                    (x.shape[0],), self.diffusion.num_timesteps // 2,
                    dtype=jnp.int32,
                )
                _, state = self.model.apply(
                    {"params": self.state.ema_params[0]},
                    x,
                    self.diffusion.scale_timesteps(t_mid),
                    x0=x,
                    obs_mask=jnp.asarray(obs),
                    latent_mask=jnp.asarray(latent),
                    kinda_marg_mask=jnp.asarray(marg),
                    frame_indices=jnp.asarray(fi),
                    observed_frames="x_0",
                    capture_attn=True,
                    mutable=["intermediates"],
                )
                inter = state["intermediates"]
                attns = {}

                def collect(tree, path=""):
                    if isinstance(tree, dict):
                        for k, v in tree.items():
                            collect(v, path + "/" + k)
                    else:
                        if "temporal" in path:
                            attns.setdefault("attn/temporal", []).append(
                                np.asarray(tree[0])
                            )
                collect(inter)
                if attns:
                    mean_attn = {
                        k: np.mean(np.stack(v), axis=0)
                        for k, v in attns.items()
                    }
                    media.log_attention_heatmaps(mean_attn, np.asarray(fi))
            except Exception as e:  # attention viz is best-effort
                logger.log(f"attention heatmap logging failed: {e}")

    # ------------------------------------------------------------------ #
    # visualisation / mask dumping (reference train_util.py:758-816)
    # ------------------------------------------------------------------ #
    def visualise(self, out_dir=None):
        """Render mask draws + noisy inputs at several noise quartiles to PNG
        (reference --just_visualise; wandb sinks replaced by files)."""
        import jax.numpy as jnp
        from PIL import Image

        out_dir = out_dir or os.path.join(logger.get_dir() or ".", "visualise")
        os.makedirs(out_dir, exist_ok=True)
        batch = np.concatenate(self.valid_batches, axis=0)
        rng = np.random.default_rng(0)
        _, obs, latent, marg = self.mask_sampler.sample_all_masks(
            rng, batch, gather=False
        )
        vis = np.ones_like(batch)
        vis = np.where(obs == 1, batch, vis)
        for quartile in [0, 1, 2, 3, 3.99]:
            t = int(self.diffusion.num_timesteps * (quartile / 4))
            key = jax.random.PRNGKey(int(quartile * 100))
            noise = jax.random.normal(key, batch.shape)
            xt = np.asarray(
                self.diffusion.q_sample(
                    jnp.asarray(batch), jnp.full((len(batch),), t), noise
                )
            )
            v = np.where(latent == 1, xt, vis)
            self._save_video_grid(
                v, os.path.join(out_dir, f"inputs-q{quartile}.png")
            )
        # mask colour map: red = observed, green = latent
        red = np.array([1.0, -1.0, -1.0]).reshape(1, 1, 1, 1, 3)
        green = np.array([-1.0, 1.0, -1.0]).reshape(1, 1, 1, 1, 3)
        m = np.ones_like(batch)
        m = np.where(obs == 1, red * np.ones_like(batch), m)
        m = np.where(latent == 1, green * np.ones_like(batch), m)
        self._save_video_grid(m, os.path.join(out_dir, "mask.png"))
        logger.log(f"wrote visualisations to {out_dir}")

    @staticmethod
    def _save_video_grid(videos, path, pad=1):
        """(B, T, H, W, C) [-1,1] -> one PNG grid (videos as rows)."""
        from PIL import Image

        v = np.clip((videos + 1) * 127.5, 0, 255).astype(np.uint8)
        B, T, H, W, C = v.shape
        grid = np.full(
            (B * (H + pad) - pad, T * (W + pad) - pad, C), 255, dtype=np.uint8
        )
        for b in range(B):
            for t in range(T):
                grid[b * (H + pad):b * (H + pad) + H,
                     t * (W + pad):t * (W + pad) + W] = v[b, t]
        Image.fromarray(grid).save(path)

    def save_masks(self, n_masks):
        """Dump mask index draws for video_nll (reference --just_save_masks;
        pickle instead of torch.save, same (obs_list, lat_list) structure)."""
        import pickle

        batch = np.zeros((1, self.T, 4, 4, 3), dtype=np.float32)
        obs_indices, lat_indices = [], []
        for i in range(n_masks):
            rng = np.random.default_rng(i)
            _, obs, latent, _ = self.mask_sampler.sample_all_masks(
                rng, batch, gather=False
            )
            for row_o, row_l in zip(
                obs.reshape(len(obs), -1), latent.reshape(len(latent), -1)
            ):
                obs_indices.append([list(np.nonzero(row_o)[0])])
                lat_indices.append([list(np.nonzero(row_l)[0])])
        os.makedirs("samples/indices", exist_ok=True)
        path = (
            f"samples/indices/{self._args.mask_distribution}_"
            f"{self._args.max_frames}_{self._args.T}_frame_indices.pt"
        )
        with open(path, "wb") as f:
            pickle.dump((obs_indices, lat_indices), f)
        logger.log(f"wrote {path}")
