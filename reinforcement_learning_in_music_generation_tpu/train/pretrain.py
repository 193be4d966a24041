"""Agent / discriminator pretrain loops (R1-R3 of SURVEY §2.3).

One jitted train step (loss = mean of 6 masked field CEs, Adam lr 1e-4,
grad-clip 3 — dqn_policy/agent_pretrain.py:516,557-565) running under a
('dp','tp') mesh: batches sharded over dp, Megatron weight shardings over
tp (parallel/sharding.py).  Loss-bucketed checkpoints and early stop at
loss <= 0.05 reproduce agent_pretrain.py:594-632.
"""

from __future__ import annotations

import functools
import threading
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LinearTransformerConfig, PretrainConfig, WindowTransformerConfig
from ..models import linear_transformer as lt
from ..models import longformer as lf
from ..utils.saver import MetricsBus, Saver, loss_bucket_filename
from ..utils.checkpoint import save_checkpoint
from . import optim


# ---------------------------------------------------------------------------
# jitted steps
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "tx", "dp_mesh"))
def agent_train_step(params, opt_state, cfg: LinearTransformerConfig, tx,
                     x, y, mask, rng, dp_mesh=None):
    """One CE pretrain step -> (params', opt_state', (loss, per-field)).

    With cfg.dtype == 'bfloat16' this is mixed precision: f32 master weights
    in the optimizer, bf16 compute (the CE reduces in f32; the Pallas
    attention kernels accumulate in f32 regardless).

    `dp_mesh` (static; a Mesh is hashable): a dp-only mesh keeps the fused
    Pallas training tail by running it per batch shard under shard_map —
    without it, multi-device falls back to the all-XLA layer
    (models/linear_transformer.py:_ffn_backend)."""
    def loss_fn(p):
        if cfg.dtype != "float32":
            p = jax.tree_util.tree_map(
                lambda a: a.astype(cfg.dtype), p)
        losses = lt.train_losses(p, cfg, x, y, mask, deterministic=False,
                                 rng=rng, dp_mesh=dp_mesh)
        return jnp.mean(losses), losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    import optax
    params = optax.apply_updates(params, updates)
    return params, opt_state, (loss, losses)


@functools.partial(jax.jit, static_argnames=("cfg", "dp_mesh", "scale"))
def agent_grad_step(params, cfg: LinearTransformerConfig, x, y, mask, rng,
                    dp_mesh=None, scale: float = 1.0):
    """Gradients + loss only (no optimizer) — the micro-batch unit of
    gradient accumulation.  `scale` pre-divides by the accumulation
    count so summing micro-grads yields the MEAN gradient (what a single
    step on the concatenated batch computes, equal-sized masks)."""
    def loss_fn(p):
        if cfg.dtype != "float32":
            p = jax.tree_util.tree_map(lambda a: a.astype(cfg.dtype), p)
        losses = lt.train_losses(p, cfg, x, y, mask, deterministic=False,
                                 rng=rng, dp_mesh=dp_mesh)
        return jnp.mean(losses), losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if scale != 1.0:
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    return grads, (loss, losses)


@jax.jit
def _tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


@functools.partial(jax.jit, static_argnames=("tx",), donate_argnums=(0, 1))
def apply_grads(params, opt_state, tx, grads):
    import optax
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tx", "mesh", "n_microbatch"))
def agent_pp_train_step(params, opt_state, cfg: LinearTransformerConfig, tx,
                        x, y, mask, rng, mesh=None, n_microbatch=None):
    """agent_train_step through the pipeline-parallel forward
    (parallel/pipeline.py): layer slabs staged over the mesh's 'pp' axis,
    batch rows over 'dp'.  Same loss semantics; jax.grad runs the reverse
    pipeline."""
    from ..parallel.pipeline import pipeline_train_step
    return pipeline_train_step(params, opt_state, cfg, tx, x, y, mask, rng,
                               mesh, n_microbatch)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "mesh", "n_microbatch", "scale"))
def agent_pp_grad_step(params, cfg: LinearTransformerConfig, x, y, mask,
                       rng, mesh=None, n_microbatch=None,
                       scale: float = 1.0):
    """Gradient-accumulation micro-step on a pipeline mesh: grads + loss
    through the GPipe schedule, no optimizer (parallel/pipeline.py:
    pipeline_grad_step)."""
    from ..parallel.pipeline import pipeline_grad_step
    return pipeline_grad_step(params, cfg, x, y, mask, rng, mesh,
                              n_microbatch, scale)


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def longformer_lm_step(params, opt_state, cfg: WindowTransformerConfig, tx,
                       x, y, mask, rng):
    """Discriminator LM pretrain step (dqn_policy/discrim-pretrain.py:342-
    490): per-field masked CE through the window transformer."""
    from ..ops.losses import fields_cross_entropy

    def loss_fn(p):
        logits = lf.token_logits(p, cfg, x, mask, deterministic=False, rng=rng)
        losses = fields_cross_entropy(logits, y, mask)
        return jnp.mean(losses), losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    import optax
    params = optax.apply_updates(params, updates)
    return params, opt_state, (loss, losses)


@functools.partial(jax.jit, static_argnames=("cfg", "scale"))
def longformer_grad_step(params, cfg: WindowTransformerConfig, x, y, mask,
                         rng, scale: float = 1.0):
    """Gradient-accumulation micro-step for the discriminator LM
    (longformer_lm_step without the optimizer; VERDICT r4 #3 — the accum
    path must cover non-agent step fns)."""
    from ..ops.losses import fields_cross_entropy

    def loss_fn(p):
        logits = lf.token_logits(p, cfg, x, mask, deterministic=False,
                                 rng=rng)
        losses = fields_cross_entropy(logits, y, mask)
        return jnp.mean(losses), losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    if scale != 1.0:
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    return grads, (loss, losses)


# ---------------------------------------------------------------------------
# host loop
# ---------------------------------------------------------------------------

# Set by the SIGTERM/SIGINT handler (pcfg.save_on_interrupt) or directly
# by an embedding application: the loop checkpoints and returns cleanly
# at the next batch boundary.  Module-level so a handler installed once
# covers any number of pretrain() calls.
INTERRUPT = threading.Event()


def _install_interrupt_handler():
    import signal

    def handler(signum, frame):
        INTERRUPT.set()
    try:
        signal.signal(signal.SIGTERM, handler)
        signal.signal(signal.SIGINT, handler)
    except ValueError:
        pass        # not the main thread; caller sets INTERRUPT directly


def pretrain(params, cfg, train_x, train_y, train_mask,
             pcfg: PretrainConfig = PretrainConfig(), *,
             step_fn: Callable = agent_train_step,
             mesh=None, metrics: Optional[MetricsBus] = None,
             max_steps: Optional[int] = None,
             on_epoch_end: Optional[Callable] = None,
             resume_from: Optional[str] = None):
    """Full pretrain loop (agent_pretrain.py:485-632).

    Returns (params, opt_state, history).  `max_steps` bounds total batches
    (for tests/benchmarks); `mesh` shards batches over 'dp';
    `resume_from` restores params + optimizer state + epoch from a
    checkpoint (true resume — the reference saves optimizer state but never
    restores it, SURVEY §5).

    With pcfg.save_on_interrupt, SIGTERM/SIGINT (the TPU-pod preemption
    signal) checkpoints to `<ckpt_dir>/interrupt.ckpt` at the next batch
    boundary and returns cleanly — resume_from that path continues the
    run.  Embedders can set train.pretrain.INTERRUPT directly instead of
    sending a signal."""
    accum = max(1, pcfg.grad_accum)
    # lr schedules count OPTIMIZER steps; with accumulation each step
    # consumes `accum` micro-batches
    num_batch_sched = max(1, len(train_x) // pcfg.batch_size // accum)
    if pcfg.lr_milestones:
        # reference milestones are epochs (torch scheduler.step() per
        # epoch, my_pretrain.py:63-66); optax counts optimizer steps
        lr = optim.multistep_lr(
            pcfg.lr, tuple(int(m) * num_batch_sched
                           for m in pcfg.lr_milestones), pcfg.lr_gamma)
    else:
        lr = pcfg.lr
    tx = optim.adam(lr, grad_clip=pcfg.grad_clip)
    if pcfg.zero1:
        if mesh is None or mesh.shape.get("dp", 1) <= 1:
            raise ValueError("PretrainConfig.zero1 needs a mesh with dp>1 "
                             "(the optimizer state shards over 'dp')")
        if "pp" in mesh.shape:
            raise ValueError("zero1 on a pipeline mesh is not implemented "
                             "(moments would need the layer-stack 'pp' "
                             "sharding on top of 'dp'); use a ('dp','tp') "
                             "mesh")
        tx = optim.zero1(tx, mesh, params)
    opt_state = tx.init(params)
    from ..utils import checkpoint as ckpt_lib
    if pcfg.ckpt_backend == "orbax":
        _save_ckpt = ckpt_lib.save_checkpoint_orbax
    else:
        _save_ckpt = save_checkpoint
    start_epoch = 0
    if resume_from is not None:
        # a directory is an orbax checkpoint; a file is the pickle format
        import os as _os
        load = (ckpt_lib.load_checkpoint_orbax
                if _os.path.isdir(resume_from) else
                ckpt_lib.load_checkpoint)
        ck = load(resume_from, params_template=params,
                  opt_state_template=opt_state)
        params = ck["params"]
        if ck["opt_state"] is not None:
            opt_state = ck["opt_state"]
        start_epoch = int(ck["extra"].get("epoch", -1)) + 1
    saver = Saver(pcfg.exp_dir)
    bus = metrics or MetricsBus(saver)
    saver.add_summary_msg(
        f" > params amount: {lt.n_params(params):,d}")

    orig_step_fn = step_fn
    if mesh is not None and "pp" in mesh.shape:
        # ('dp','pp'[,'tp']) pipeline mesh: layer slabs over pp (ppermute
        # microbatch pipeline), rows over dp; a 'tp' axis Megatron-shards
        # within each stage (parallel/pipeline.py:_layer_forward_tp).
        from ..parallel.pipeline import shard_params_pp
        params = shard_params_pp(mesh, params)
        if step_fn is agent_train_step:
            step_fn = functools.partial(agent_pp_train_step, mesh=mesh)
    elif mesh is not None:
        from ..parallel import shard_batch, shard_params
        params = shard_params(mesh, params)
    if (mesh is not None and "pp" not in mesh.shape
            and step_fn is agent_train_step):
        # thread the mesh regardless of tp: the backend guards need the
        # TRUE tp to enforce their fused-kernel fallbacks (tp>1 always
        # drops to the all-XLA layer — partial-sum LN — even against an
        # env override).  dp-only meshes keep the fused Pallas tail,
        # sharded per batch shard.
        step_fn = functools.partial(step_fn, dp_mesh=mesh)

    # gradient accumulation: pick the micro-grad step matching the step
    # fn (VERDICT r4 #3 — accum composes with pp meshes and the
    # longformer LM; only truly custom step_fns are out of scope).
    # All grad steps share the signature (params, cfg, x, y, mask, rng,
    # scale=1/K) with mesh knobs partial'ed in.
    grad_step = None
    if accum > 1:
        if mesh is not None and "pp" in mesh.shape:
            if orig_step_fn is not agent_train_step:
                raise ValueError("grad_accum on a pipeline mesh only "
                                 "supports the LinearTransformer agent "
                                 "path")
            grad_step = functools.partial(agent_pp_grad_step, mesh=mesh)
        elif orig_step_fn is agent_train_step:
            grad_step = functools.partial(agent_grad_step, dp_mesh=mesh)
        elif orig_step_fn is longformer_lm_step:
            grad_step = longformer_grad_step
        else:
            raise ValueError("grad_accum needs a known step_fn "
                             "(agent_train_step / longformer_lm_step / "
                             "agent pp path); custom step_fns must apply "
                             "their own accumulation")
    if pcfg.save_on_interrupt:
        _install_interrupt_handler()
        INTERRUPT.clear()
    n = len(train_x)
    num_batch = n // pcfg.batch_size
    rng = jax.random.key(pcfg.seed, impl=pcfg.prng_impl)
    grads_acc, micro = None, 0
    steps_done = 0
    history = []
    start = time.time()
    for epoch in range(start_epoch, pcfg.n_epoch):
        # accumulate losses on-device; fetching every batch costs a host
        # round-trip (~tens of ms on the tunneled TPU) and serializes steps
        acc_loss = jnp.zeros(())
        acc_losses = jnp.zeros(len(cfg.vocab_sizes))
        from .data_pipeline import prefetch_batches
        for bidx, (bx, by, bm) in prefetch_batches(
                train_x, train_y, train_mask, pcfg.batch_size, mesh=mesh,
                depth=pcfg.prefetch_depth):
            saver.global_step_increment()
            rng, step_rng = jax.random.split(rng)
            if accum == 1:
                params, opt_state, (loss, losses) = step_fn(
                    params, opt_state, cfg, tx, bx, by, bm, step_rng)
            else:
                # gradient accumulation: K micro-grads (pre-scaled 1/K)
                # sum to the mean gradient, one optimizer step per K.
                # Host loop, not lax.scan — scanning grad steps stalls
                # the axon compiler (BENCH.md platform findings).  The
                # window carries across epoch boundaries (streaming
                # semantics; no partial-window bias at epoch end).
                grads, (loss, losses) = grad_step(
                    params, cfg, bx, by, bm, step_rng, scale=1.0 / accum)
                grads_acc = (grads if grads_acc is None
                             else _tree_add(grads_acc, grads))
                micro += 1
                if micro == accum:
                    params, opt_state = apply_grads(params, opt_state, tx,
                                                    grads_acc)
                    grads_acc, micro = None, 0
            acc_loss = acc_loss + loss
            acc_losses = acc_losses + losses
            if (bidx + 1) % max(1, pcfg.log_every) == 0 or bidx == num_batch - 1:
                bus.log({"batch loss": float(loss)})
            steps_done += 1
            if pcfg.save_on_interrupt and INTERRUPT.is_set():
                if grads_acc is not None:
                    params, opt_state = apply_grads(params, opt_state, tx,
                                                    grads_acc)
                path = f"{pcfg.ckpt_dir}/interrupt.ckpt"
                _save_ckpt(path, params, opt_state, step=saver.global_step,
                           extra={"epoch": epoch - 1, "interrupted": True})
                if pcfg.ckpt_backend == "orbax":
                    ckpt_lib.wait_for_checkpoints()
                saver.add_summary_msg(
                    f" > interrupted: checkpoint saved to {path}")
                return params, opt_state, history
            if max_steps is not None and steps_done >= max_steps:
                # max_steps counts MICRO-batches when accumulating; a
                # pending partial window still applies (1/K-scaled, so
                # the trailing step is proportionally smaller — samples
                # are never silently dropped)
                if grads_acc is not None:
                    params, opt_state = apply_grads(params, opt_state, tx,
                                                    grads_acc)
                return params, opt_state, history

        acc_loss = float(acc_loss)
        acc_losses = np.asarray(acc_losses)
        epoch_loss = acc_loss / max(num_batch, 1)
        history.append(epoch_loss)
        runtime = time.time() - start
        bus.log({"epoch loss": epoch_loss})
        saver.add_summary("epoch each loss", ", ".join(
            f"{v / max(num_batch, 1):04f}" for v in acc_losses))
        if on_epoch_end is not None:
            on_epoch_end(epoch, epoch_loss, params, opt_state)

        # loss-bucketed checkpointing + early stop (agent_pretrain.py:594-632)
        bucket = loss_bucket_filename(epoch_loss)
        if bucket is None:
            if grads_acc is not None:   # pending partial accum window
                params, opt_state = apply_grads(params, opt_state, tx,
                                                grads_acc)
                grads_acc = None
            _save_ckpt(f"{pcfg.ckpt_dir}/trainloss_final.ckpt", params,
                            opt_state, step=saver.global_step,
                            extra={"epoch": epoch, "loss": epoch_loss})
            return params, opt_state, history
        _save_ckpt(f"{pcfg.ckpt_dir}/{bucket}.ckpt", params, opt_state,
                        step=saver.global_step,
                        extra={"epoch": epoch, "loss": epoch_loss})
    if grads_acc is not None:           # pending partial accum window
        params, opt_state = apply_grads(params, opt_state, tx, grads_acc)
    if pcfg.ckpt_backend == "orbax":   # flush in-flight async saves
        ckpt_lib.wait_for_checkpoints()
    return params, opt_state, history
