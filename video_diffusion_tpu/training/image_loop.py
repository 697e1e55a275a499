"""Image / super-res training loop: the original improved-diffusion pipeline
(reference scripts/image_train.py + train_util.TrainLoop without the video
mask machinery). Shares the jitted-step design of train_loop.py."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.nn import update_ema
from ..models.wrappers import make_image_model_fn
from ..parallel import mesh as mesh_lib
from ..training.resample import LossAwareSampler, UniformSampler
from ..training.train_loop import TrainState, make_optimizer
from ..utils import checkpoint as ckpt_lib
from ..utils import logger


def build_image_train_step(model, diffusion, optimizer, ema_rates,
                           low_res_key=None):
    def loss_fn(params, batch, rng):
        x = batch["x"]  # (B, H, W, C)
        drng, lrng = jax.random.split(rng)
        model_fn = make_image_model_fn(
            model,
            {"params": params},
            diffusion,
            y=batch.get("y"),
            low_res=batch.get("low_res"),
            train=True,
        )
        terms = diffusion.training_losses(
            lambda xx, tt, cond=None: model_fn(xx, tt),
            x,
            batch["t"],
            lrng,
        )
        loss = (terms["loss"] * batch["weights"]).mean()
        return loss, {k: v * batch["weights"] for k, v in terms.items()}

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state, batch, rng):
        (loss, terms), grads = grad_fn(state.params, batch, rng)
        grad_norm = optax.global_norm(grads)
        grads_ok = jnp.isfinite(grad_norm)
        safe = jax.tree_util.tree_map(
            lambda g: jnp.where(grads_ok, g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = optimizer.update(safe, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_params, new_opt = jax.tree_util.tree_map(
            lambda new, old: jnp.where(grads_ok, new, old),
            (new_params, new_opt),
            (state.params, state.opt_state),
        )
        new_ema = tuple(
            update_ema(e, new_params, r) for e, r in zip(state.ema_params, ema_rates)
        )
        return (
            state.replace(
                step=state.step + 1, params=new_params, opt_state=new_opt,
                ema_params=new_ema,
            ),
            {"grad_norm": grad_norm, **terms},
        )

    return train_step


class ImageTrainLoop:
    def __init__(
        self,
        *,
        model,
        diffusion,
        data,
        batch_size,
        lr,
        ema_rate,
        log_interval,
        save_interval,
        resume_checkpoint="",
        schedule_sampler=None,
        weight_decay=0.0,
        lr_anneal_steps=0,
        iterations=1000000,
        args=None,
        is_super_res=False,
        seed=0,
        microbatch=-1,
        use_fp16=False,
        fp16_scale_growth=1e-3,
    ):
        del microbatch, use_fp16, fp16_scale_growth
        self._args = args
        self.model = model
        self.diffusion = diffusion
        self.data = data
        self.batch_size = batch_size
        self.ema_rate = (
            [ema_rate] if isinstance(ema_rate, float)
            else [float(x) for x in str(ema_rate).split(",")]
        )
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.schedule_sampler = schedule_sampler or UniformSampler(diffusion)
        self.lr = lr
        self.lr_anneal_steps = lr_anneal_steps
        self.iterations = iterations
        self.is_super_res = is_super_res
        self.mesh = mesh_lib.make_mesh()
        self.rng = np.random.default_rng(seed)
        self.jrng = jax.random.PRNGKey(seed)
        self.step = 0
        self.resume_checkpoint = resume_checkpoint

        batch, cond = next(self.data)
        init_kwargs = {}
        if "y" in cond:
            init_kwargs["y"] = jnp.asarray(cond["y"][:1])
        x1 = jnp.asarray(batch[:1])
        t1 = jnp.zeros((1,), dtype=jnp.int32)
        if is_super_res:
            init_kwargs["low_res"] = jnp.asarray(cond["low_res"][:1])
            variables = self.model.init(
                {"params": jax.random.PRNGKey(seed)},
                x1, diffusion.scale_timesteps(t1), **init_kwargs,
            )
        else:
            variables = self.model.init(
                {"params": jax.random.PRNGKey(seed)},
                x1[:, None], diffusion.scale_timesteps(t1), **init_kwargs,
            )
        params = variables["params"]
        if resume_checkpoint:
            data_ck = ckpt_lib.load_checkpoint(resume_checkpoint)
            params = jax.tree_util.tree_map(jnp.asarray, data_ck["state_dict"])
            self.step = data_ck["step"]
        self.optimizer = make_optimizer(lr, weight_decay, iterations, lr_anneal_steps)
        self.state = TrainState(
            step=jnp.asarray(self.step, jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            ema_params=tuple(
                jax.tree_util.tree_map(jnp.copy, params)
                for _ in self.ema_rate
            ),
        )
        self.state = jax.device_put(
            self.state, mesh_lib.replicated_sharding(self.mesh)
        )
        self._step_fn = jax.jit(
            build_image_train_step(
                model, diffusion, self.optimizer, tuple(self.ema_rate)
            ),
            donate_argnums=(0,),
        )

    def _log_pending(self):
        if self._pending is None:
            return
        metrics, t, step = self._pending
        self._pending = None
        if isinstance(self.schedule_sampler, LossAwareSampler):
            self.schedule_sampler.update_with_local_losses(
                t, np.asarray(metrics["loss"])
            )
        logger.logkv("step", step)
        for k, v in metrics.items():
            logger.logkv_mean(k, float(np.asarray(v).mean()))

    def run_loop(self):
        # pipelined like TrainLoop.run_step: metrics of step N-1 are
        # materialised only after step N is dispatched, so the host-side
        # batch prep overlaps device compute
        self._pending = None
        while self.step < self.iterations and (
            not self.lr_anneal_steps or self.step < self.lr_anneal_steps
        ):
            t0 = time.time()
            batch, cond = next(self.data)
            t, weights = self.schedule_sampler.sample(len(batch), self.rng)
            dev_batch = {
                "x": np.asarray(batch, np.float32),
                "t": t,
                "weights": weights,
            }
            for k in ("y", "low_res"):
                if k in cond:
                    dev_batch[k] = np.asarray(cond[k])
            dev_batch = mesh_lib.shard_batch(dev_batch, self.mesh)
            self.jrng, srng = jax.random.split(self.jrng)
            self.state, metrics = self._step_fn(self.state, dev_batch, srng)
            self._log_pending()
            self._pending = (metrics, t, self.step)
            logger.logkv("timing/step_time", time.time() - t0)
            if self.step % self.log_interval == 0:
                self._log_pending()
                logger.dumpkvs()
            if self.step % self.save_interval == 0:
                self.save()
                if os.environ.get("DIFFUSION_TRAINING_TEST", "") and self.step > 0:
                    return
            self.step += 1
        self._log_pending()
        if (self.step - 1) % self.save_interval != 0:
            self.save()

    def save(self):
        if jax.process_index() != 0:
            return
        run_id = getattr(self._args, "resume_id", "") or os.environ.get(
            "VDT_RUN_ID", "image-run"
        )
        logdir = ckpt_lib.get_blob_logdir(run_id)
        ckpt_lib.save_checkpoint(
            logdir,
            params=jax.device_get(self.state.params),
            ema_params=[jax.device_get(e) for e in self.state.ema_params],
            ema_rates=self.ema_rate,
            opt_state=jax.device_get(self.state.opt_state),
            config=self._args.__dict__ if self._args else {},
            step=self.step,
            save_latest_only=getattr(self._args, "save_latest_only", False),
        )
        logger.log(f"saved checkpoint at step {self.step} to {logdir}")
