"""KD-QAT trainer — optax/pjit replacement for the reference's `KDTrainer`.

Reference: utils/kd_trainer.py:38-288 (HF `Trainer` subclass) + train.py:42-149
(entry point) + run_train.sh:8-43 (canonical hyperparams). What torch FSDP,
apex, fairscale and the HF loop did imperatively is here one jitted,
mesh-sharded train step:

  * loss = ``kd_loss_scale * KL(student || teacher)`` with *batchmean*
    reduction — sum over sequence and vocab divided by batch size only, and
    NO ground-truth CE term during training (kd_trainer.py:42-48, :71-79);
  * teacher forward under ``stop_gradient`` (kd_trainer.py:55-60's
    ``no_grad``), teacher params carried outside the optimizer state — the
    analog of FSDP ``ignored_modules=[teacher]`` (kd_trainer.py:251-253) is
    simply that the teacher is a separate frozen pytree;
  * optimizer: AdamW (optim="adamw_torch", process_args.py:73) with global
    grad-norm clip 1.0 (HF default the reference inherits), cosine decay
    from lr 2e-5 with no warmup (run_train.sh:30-33);
  * remat on the decoder scan body = --gradient_checkpointing
    (run_train.sh:36);
  * sharding: params/grads/Adam state over the ('data','fsdp','tp') mesh via
    NamedSharding — the ZeRO-3 behavior of run_train.sh:42-43.

Eval is the HF default path (label CE -> perplexity), train.py:131-143.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llm_qat_tpu.models import llama
from llm_qat_tpu.models.config import LlamaConfig
from llm_qat_tpu.parallel import mesh as pmesh


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Canonical QAT recipe (run_train.sh:8-43 + HF Trainer defaults)."""

    learning_rate: float = 2e-5
    total_steps: int = 1000
    warmup_steps: int = 0              # --warmup_ratio default 0
    weight_decay: float = 0.0          # HF default
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0         # HF default, not overridden
    lr_schedule: str = "cosine"        # --lr_scheduler_type cosine
    kd_loss_scale: float = 1.0         # process_args.py:84
    kd_loss_type: str = "kl"           # "kl" (default) | "mse" — the
                                       # reference carries an unused mse_loss
                                       # alternative (kd_trainer.py:50-51)
    use_kd: bool = True
    grad_accum_steps: int = 1
    remat: bool = True                 # --gradient_checkpointing True
    compute_dtype: Any = jnp.bfloat16  # --bf16 True
    kl_chunk: int = 0                  # >0: chunk seq dim of the KL to bound
                                       # the fp32 [b,s,V] logits memory
                                       # (SURVEY.md §7 hard parts)
    num_microbatches: int = 0          # pipeline microbatches (0: = pp size)
    # Single-pass clip+AdamW (round 5): same math as the optax chain, one
    # HBM round-trip per leaf instead of one per chained transform
    # (measured 155 -> ~25 ms on the 1.1B tree, DESIGN.md train study).
    fused_optimizer: bool = True


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def kd_kl_loss(
    student_logits: jax.Array,
    teacher_logits: jax.Array,
    chunk: int = 0,
) -> jax.Array:
    """``F.kl_div(log_softmax(S,2), softmax(T,2), reduction="batchmean")``
    (kd_trainer.py:42-48): sum over (seq, vocab) of ``p_T (log p_T - log
    p_S)``, divided by the *batch size only*.

    ``chunk>0`` evaluates the reduction in sequence chunks under ``lax.map``
    so only a ``[b, chunk, V]`` fp32 slab is live at once.
    """
    b = student_logits.shape[0]

    def kl_sum(s, t):
        acc_t = jnp.promote_types(s.dtype, jnp.float32)
        ls = jax.nn.log_softmax(s.astype(acc_t), axis=-1)
        lt = jax.nn.log_softmax(t.astype(acc_t), axis=-1)
        pt = jnp.exp(lt)
        return jnp.sum(pt * (lt - ls))

    if chunk and student_logits.shape[1] % chunk == 0:
        n = student_logits.shape[1] // chunk
        s = student_logits.reshape(b, n, chunk, -1).swapaxes(0, 1)
        t = teacher_logits.reshape(b, n, chunk, -1).swapaxes(0, 1)
        total = jnp.sum(jax.lax.map(lambda st: kl_sum(*st), (s, t)))
    else:
        total = kl_sum(student_logits, teacher_logits)
    return total / b


def chunked_kd_kl(
    student_h: jax.Array,   # [b, s, H] post-final-norm hidden (bf16)
    teacher_h: jax.Array,   # [b, s, H]
    student_head: jax.Array,  # [H, V]
    teacher_head: jax.Array,  # [H, V]
    chunk: int,
) -> jax.Array:
    """`kd_kl_loss` with the lm_head fused into the sequence chunks.

    The full fp32 ``[b, s, V]`` logits never exist: each scan step projects
    one ``[b, chunk, H]`` slice through the head, reduces the KL sum in
    fp32, and ``jax.checkpoint`` on the body drops the per-chunk logits so
    the backward recomputes them instead of saving n copies. Peak loss
    memory is one chunk's logits (student+teacher) instead of 4 full-size
    fp32 tensors — the fix for SURVEY.md §7's "logits dominate step memory"
    hard part. Numerics are identical to `kd_kl_loss` (same matmul dtype,
    same fp32 reduction order over chunks)."""
    b, s, _ = student_h.shape
    if not (chunk and s % chunk == 0):
        chunk = s
    n = s // chunk
    hs = jnp.moveaxis(student_h.reshape(b, n, chunk, -1), 1, 0)
    ht = jnp.moveaxis(teacher_h.reshape(b, n, chunk, -1), 1, 0)

    @jax.checkpoint
    def body(carry, xs):
        hs_i, ht_i = xs
        acc_t = jnp.promote_types(hs_i.dtype, jnp.float32)
        ls = jax.nn.log_softmax(
            jnp.matmul(
                hs_i, student_head.astype(hs_i.dtype),
                preferred_element_type=acc_t,
            ),
            axis=-1,
        )
        lt = jax.nn.log_softmax(
            jnp.matmul(
                ht_i, teacher_head.astype(ht_i.dtype),
                preferred_element_type=acc_t,
            ),
            axis=-1,
        )
        pt = jnp.exp(lt)
        return carry + jnp.sum(pt * (lt - ls)), None

    total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (hs, ht))
    return total / b


# ---------------------------------------------------------------------------
# Optimizer / schedule
# ---------------------------------------------------------------------------


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if cfg.warmup_steps else cfg.learning_rate,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=cfg.total_steps,
            end_value=0.0,
        )
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_schedule == "linear":
        return optax.linear_schedule(
            cfg.learning_rate, 0.0, cfg.total_steps - cfg.warmup_steps
        )
    raise ValueError(f"unknown schedule {cfg.lr_schedule}")


class FusedClipAdamWState(NamedTuple):
    """State of :func:`fused_clip_adamw` — mu/nu mirror the param tree so
    the ZeRO-3 opt-state sharding logic (``_opt_state_specs``) applies the
    param specs to them unchanged."""

    count: jax.Array
    mu: Any
    nu: Any


def fused_clip_adamw(
    schedule, b1: float, b2: float, eps: float, weight_decay: float,
    max_norm: float,
) -> optax.GradientTransformation:
    """``clip_by_global_norm + adamw`` fused into ONE pass per leaf.

    Mathematically identical to the optax chain (same clip rule, moment
    updates, bias correction, decoupled weight decay, schedule indexing);
    structurally different: optax materializes an HBM round-trip per
    chained transform (clip-scale, mu, nu, bias-corrected update, weight
    decay, lr scale — measured 155 ms vs an 18.8 ms traffic floor on the
    1.1B tree on v5e, DESIGN.md round-5 train study). Here each leaf is
    read once (g, mu, nu, p) and written once (update, mu, nu), and XLA
    emits a single fusion per leaf.
    """

    def init_fn(params):
        z = lambda t: jnp.zeros_like(t)
        return FusedClipAdamWState(
            jnp.zeros((), jnp.int32),
            jax.tree.map(z, params),
            jax.tree.map(z, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("fused_clip_adamw requires params (weight decay)")
        g_norm = optax.global_norm(updates)
        # optax.clip_by_global_norm: scale only when the norm exceeds
        clip = jnp.where(
            g_norm < max_norm, jnp.float32(1.0), max_norm / g_norm
        )
        count_inc = optax.safe_int32_increment(state.count)
        lr = schedule(state.count)
        bc1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count_inc.astype(jnp.float32)

        def leaf(g, mu, nu, p):
            dt = g.dtype
            gc = g * clip.astype(dt)
            mu = b1 * mu + (1.0 - b1) * gc.astype(mu.dtype)
            nu = b2 * nu + (1.0 - b2) * (gc * gc).astype(nu.dtype)
            mu_hat = mu / bc1.astype(mu.dtype)
            nu_hat = nu / bc2.astype(nu.dtype)
            u = mu_hat / (jnp.sqrt(nu_hat) + jnp.asarray(eps, nu.dtype))
            if weight_decay:
                u = u + weight_decay * p.astype(u.dtype)
            return (-lr.astype(u.dtype) * u).astype(dt), mu, nu

        out = jax.tree.map(leaf, updates, state.mu, state.nu, params)
        upd = jax.tree.map(lambda t: t[0], out, is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return upd, FusedClipAdamWState(count_inc, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.fused_optimizer:
        tx = fused_clip_adamw(
            make_schedule(cfg), cfg.adam_b1, cfg.adam_b2, cfg.adam_eps,
            cfg.weight_decay, cfg.max_grad_norm,
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adamw(
                make_schedule(cfg),
                b1=cfg.adam_b1,
                b2=cfg.adam_b2,
                eps=cfg.adam_eps,
                weight_decay=cfg.weight_decay,
            ),
        )
    if cfg.grad_accum_steps > 1:
        # true micro-batch accumulation (HF Trainer steps the optimizer every
        # grad_accum steps; the reference scales the loss, kd_trainer.py:112-114
        # — MultiSteps' grad averaging is the same update)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------


def make_train_step(
    model_cfg: LlamaConfig,
    teacher_cfg: LlamaConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    parallel: str = "fsdp",
) -> Callable:
    """Build the fused KD-QAT step: teacher fwd + student fwd/bwd + clip +
    AdamW update, one jit. The teacher forward sits *outside* the student's
    remat scope so it is never recomputed in the backward pass (SURVEY.md §7
    "Two-model step under remat").

    ``parallel`` selects the student forward (VERDICT round-2 item 7):
      * "fsdp" — llama.forward under GSPMD sharding (the reference's
        production path, run_train.sh:42-43);
      * "pp"   — parallel.pipeline.pipeline_forward over the mesh's pp
        axis (GPipe); teacher stays data-parallel (llama.forward on
        replicated params);
      * "cp"   — models.llama_cp.cp_forward ring attention over the cp
        axis (student AND teacher — both are plain forwards, and the
        sequence shards divide the logits memory).
    pp/cp use the unchunked KD loss: their logits are sequence-sharded so
    the fp32 slab is already 1/n per device."""

    def student_forward(params, ids, mask):
        if parallel == "pp":
            from llm_qat_tpu.parallel import pipeline

            assert mask is None, "pipeline training expects packed blocks"
            mb = train_cfg.num_microbatches or mesh.shape["pp"]
            return pipeline.pipeline_forward(
                params, model_cfg, ids, mesh,
                num_microbatches=mb, remat=train_cfg.remat,
                dtype=train_cfg.compute_dtype,
            )
        if parallel == "cp":
            from llm_qat_tpu.models import llama_cp

            assert mask is None, "cp training expects packed blocks"
            return llama_cp.cp_forward(
                params, model_cfg, ids, mesh,
                remat=train_cfg.remat, dtype=train_cfg.compute_dtype,
            )
        return llama.forward(
            params, model_cfg, ids, attention_mask=mask,
            remat=train_cfg.remat, dtype=train_cfg.compute_dtype,
        )

    def teacher_forward(teacher_params, ids, mask):
        if parallel == "cp":
            from llm_qat_tpu.models import llama_cp

            return llama_cp.cp_forward(
                teacher_params, teacher_cfg, ids, mesh,
                dtype=train_cfg.compute_dtype,
            )
        return llama.forward(
            teacher_params, teacher_cfg, ids, attention_mask=mask,
            dtype=train_cfg.compute_dtype,
        )

    def step(
        state: TrainState,
        teacher_params: Any,
        batch: Dict[str, jax.Array],
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        ids = batch["input_ids"]
        mask = batch.get("attention_mask")
        chunked_kl = (
            train_cfg.use_kd
            and train_cfg.kd_loss_type != "mse"
            and bool(train_cfg.kl_chunk)
            and parallel == "fsdp"
        )

        if chunked_kl:
            # head fused into the chunked loss: full logits never exist
            teacher_ref = jax.lax.stop_gradient(
                llama.final_hidden(
                    teacher_params, teacher_cfg, ids,
                    attention_mask=mask, dtype=train_cfg.compute_dtype,
                )
            )
            teacher_head = jax.lax.stop_gradient(
                llama.head_matrix(teacher_params, teacher_cfg)
            )
        elif train_cfg.use_kd:
            teacher_ref = jax.lax.stop_gradient(
                teacher_forward(teacher_params, ids, mask)
            )
        else:
            # vanilla label-CE training (train.py:63-70 path): no teacher —
            # teacher_params may be None and must not be traced
            teacher_ref = None

        def loss_fn(params):
            if chunked_kl:
                student_h = llama.final_hidden(
                    params, model_cfg, ids,
                    attention_mask=mask,
                    remat=train_cfg.remat,
                    dtype=train_cfg.compute_dtype,
                )
                kd = chunked_kd_kl(
                    student_h, teacher_ref,
                    llama.head_matrix(params, model_cfg), teacher_head,
                    train_cfg.kl_chunk,
                )
                return train_cfg.kd_loss_scale * kd
            student_logits = student_forward(params, ids, mask)
            if train_cfg.use_kd:
                if train_cfg.kd_loss_type == "mse":
                    kd = jnp.mean(
                        (
                            student_logits.astype(jnp.float32)
                            - teacher_ref.astype(jnp.float32)
                        )
                        ** 2
                    )
                else:
                    kd = kd_kl_loss(student_logits, teacher_ref, 0)
                loss = train_cfg.kd_loss_scale * kd
            else:
                loss = llama.causal_lm_loss(student_logits, batch["labels"])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if train_cfg.grad_accum_steps > 1:
            loss = loss / train_cfg.grad_accum_steps
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(new_params, new_opt, state.step + 1), metrics

    return step


def make_eval_step(model_cfg: LlamaConfig, compute_dtype=jnp.bfloat16) -> Callable:
    """Eval = label CE (the reference evaluates with the *default* HF loss,
    not the KD loss — SURVEY.md §3.5); perplexity = exp(mean loss)."""

    def step(params, batch):
        logits = llama.forward(
            params, model_cfg, batch["input_ids"],
            attention_mask=batch.get("attention_mask"),
            dtype=compute_dtype,
        )
        return llama.causal_lm_loss_sum(logits, batch["labels"])

    return step


# ---------------------------------------------------------------------------
# Sharded setup
# ---------------------------------------------------------------------------


def _opt_state_specs(abstract_opt: Any, params: Any, specs: Any) -> Any:
    """PartitionSpec tree for an optax state: every params-structured
    subtree (mu, nu, MultiSteps grad buffers) gets the param specs — the
    actual ZeRO-3 sharding of Adam state — and loose leaves (step counts)
    replicate."""
    pstruct = jax.tree.structure(params)

    def rec(x):
        if jax.tree.structure(x) == pstruct:
            return specs
        if hasattr(x, "_fields"):  # optax NamedTuple states
            return type(x)(*(rec(getattr(x, f)) for f in x._fields))
        if isinstance(x, (tuple, list)):
            return type(x)(rec(c) for c in x)
        return P()

    return rec(abstract_opt)


def init_train_state(
    params: Any, tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None, specs: Any = None,
) -> TrainState:
    """Init optimizer state. Under a mesh the Adam mu/nu are explicitly
    sharded like the params (ZeRO-3: optimizer state on the fsdp axis;
    stage-sharded under pp via ``specs``) — jit's sharding propagation
    alone does NOT do this (observed: the whole opt state lands on one
    device)."""
    if mesh is None:
        opt_state = jax.jit(tx.init)(params)
        step = jnp.zeros((), jnp.int32)
    else:
        if specs is None:
            specs = pmesh.param_specs("lm_head" not in params)
        abstract = jax.eval_shape(tx.init, params)
        out_shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            _opt_state_specs(abstract, params, specs),
            is_leaf=lambda x: isinstance(x, P),
        )
        opt_state = jax.jit(tx.init, out_shardings=out_shardings)(params)
        step = jax.device_put(
            jnp.zeros((), jnp.int32), NamedSharding(mesh, P())
        )
    return TrainState(params, opt_state, step)


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    s = NamedSharding(mesh, pmesh.batch_spec())
    return {k: jax.device_put(v, s) for k, v in batch.items()}


class Trainer:
    """Minimal orchestration wrapper (the HF-`Trainer`-shaped surface):
    holds state, steps batches, evaluates perplexity, checkpoints via
    `llm_qat_tpu.utils.checkpoint`."""

    def __init__(
        self,
        model_cfg: LlamaConfig,
        train_cfg: TrainConfig,
        params: Any,
        teacher_params: Any = None,
        teacher_cfg: Optional[LlamaConfig] = None,
        mesh: Optional[Mesh] = None,
        parallel: str = "fsdp",
    ):
        """``parallel``: "fsdp" (default; GSPMD ZeRO-3 over the mesh),
        "pp" (GPipe over the mesh's pp axis — params/Adam state stage-
        sharded, teacher replicated), or "cp" (ring attention over the cp
        axis — params replicated, sequence sharded)."""
        if parallel not in ("fsdp", "pp", "cp"):
            raise ValueError(f"unknown parallel mode {parallel!r}")
        if parallel in ("pp", "cp") and (
            mesh is None or parallel not in mesh.shape
        ):
            raise ValueError(f"parallel={parallel!r} needs a mesh with that axis")
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.mesh = mesh
        self.parallel = parallel
        if teacher_params is not None:
            # the student is routinely initialized FROM the teacher
            # (train.py:55-62 loads the same checkpoint into the quant
            # arch). The train step donates the student state, so any
            # param leaf aliasing a teacher leaf would be invalidated by
            # the first step — copy aliased leaves defensively.
            tids = {id(l) for l in jax.tree.leaves(teacher_params)}
            params = jax.tree.map(
                lambda x: jnp.copy(x) if id(x) in tids else x, params
            )
        self._param_specs = None
        if mesh is not None:
            if parallel == "pp":
                from llm_qat_tpu.parallel import pipeline

                self._param_specs = pipeline.pipeline_param_specs(
                    "lm_head" not in params
                )
            elif parallel == "cp":
                # cp_forward's shard_map replicates params across the ring
                self._param_specs = jax.tree.map(lambda _: P(), params)
            if self._param_specs is not None:
                params = pmesh.shard_params(params, mesh, self._param_specs)
                if teacher_params is not None:
                    teacher_params = pmesh.shard_params(
                        teacher_params, mesh,
                        jax.tree.map(lambda _: P(), teacher_params),
                    )
            else:
                params = pmesh.shard_params(params, mesh)
                if teacher_params is not None:
                    teacher_params = pmesh.shard_params(teacher_params, mesh)
        self.teacher_params = teacher_params
        self.teacher_cfg = teacher_cfg or model_cfg.replace(
            w_bits=32, a_bits=32, kv_bits=32
        )
        self.tx = make_optimizer(train_cfg)
        self.state = init_train_state(
            params, self.tx, mesh, self._param_specs
        )
        self._step = jax.jit(
            make_train_step(
                model_cfg, self.teacher_cfg, train_cfg, self.tx,
                mesh=mesh, parallel=parallel,
            ),
            donate_argnums=(0,),
        )
        self._eval = jax.jit(make_eval_step(model_cfg, train_cfg.compute_dtype))

    def _place_batch(self, batch):
        if self.mesh is None:
            return batch
        if self.parallel == "fsdp":
            return shard_batch(batch, self.mesh)
        # pp/cp consume the global batch (shard_map distributes internally)
        s = NamedSharding(self.mesh, P())
        return {k: jax.device_put(v, s) for k, v in batch.items()}

    def train_step(self, batch: Dict[str, jax.Array]) -> Dict[str, float]:
        batch = self._place_batch(batch)
        self.state, metrics = self._step(self.state, self.teacher_params, batch)
        return metrics

    def evaluate(self, batches) -> Dict[str, float]:
        # Token-weighted aggregation as host floats: per-batch (nll_sum,
        # valid_count) scalars are pulled to the host immediately rather than
        # stacked as mesh-committed device scalars (the round-1 SIGABRT site),
        # and short final batches no longer skew the mean.
        total_nll = 0.0
        total_tokens = 0.0
        for batch in batches:
            batch = self._place_batch(batch)
            nll_sum, count = self._eval(self.state.params, batch)
            total_nll += float(nll_sum)
            total_tokens += float(count)
        mean = total_nll / max(total_tokens, 1.0)
        # np.exp overflows to inf (with a warning) instead of raising like
        # math.exp — a divergent model should report perplexity=inf, not
        # crash evaluate()
        with np.errstate(over="ignore"):
            ppl = float(np.exp(mean))
        return {"eval_loss": mean, "perplexity": ppl}
