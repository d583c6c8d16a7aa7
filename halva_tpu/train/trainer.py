"""DPA trainer: optimizer, schedules, and the sharded train step.

Replaces the reference HalvaTrainer (llava/train/halva_trainer.py:155-592)
+ DeepSpeed engine pair with one jitted function over a Mesh:

- policy params split into (trainable, frozen) sub-trees — grads and
  optimizer state exist only for the trainable leaves (LoRA factors, and
  the projector when mm_projector_lr > 0), the rest is closed over. This
  replaces PEFT's requires_grad bookkeeping and the optimizer param groups
  (halva_trainer.py:276-363).
- the frozen reference model is a second param tree; its forward runs
  inside the same jit under stop_gradient (no second engine, no
  _prepare_deepspeed).
- AdamW + linear-warmup cosine schedule (recipe of src/hallava_7b.sh:
  lr 5e-6, warmup 3%, cosine, wd 0) with optional separate projector lr.
- gradient accumulation via optax.MultiSteps (grad-acc 4 upstream).
- FSDP/TP sharding comes from halva_tpu.parallel.partition; XLA inserts
  all collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from halva_tpu.config import LlavaConfig
from halva_tpu.models import llava
from halva_tpu.train import dpa
from halva_tpu.train.lora import trainable_mask

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 5e-6
    mm_projector_lr: Optional[float] = None  # None/0 -> projector frozen
    warmup_ratio: float = 0.03
    weight_decay: float = 0.0
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    max_grad_norm: float = 1.0
    lr_schedule: str = "cosine"  # cosine | linear | constant
    # adamw | adamw8bit (block-quantized moments — the reference's
    # bitsandbytes adamw_bnb_8bit option, halva_trainer.py:349-361)
    optim: str = "adamw"
    loss_alpha: float = 0.4
    grad_accum_steps: int = 4
    num_train_steps: int = 1000
    max_phrases: int = dpa.MAX_PHRASES
    attn_impl: str = "auto"
    remat: bool = True
    # sequence-chunked logits/KL (the 7B memory recipe, see train/dpa.py):
    # None = classic full-logits path; N = lm_head applied N tokens at a
    # time inside a rematerialized scan, never materializing (B, S, V)
    loss_chunk: Optional[int] = None


# --------------------------------------------------------------------------
# trainable/frozen partition (eqx-style, None placeholders)
# --------------------------------------------------------------------------


def split_params(params: Params, mask: Params) -> Tuple[Params, Params]:
    train = jax.tree.map(
        lambda p, m: p if m else None, params, mask
    )
    frozen = jax.tree.map(
        lambda p, m: None if m else p, params, mask
    )
    return train, frozen


def combine_params(train: Params, frozen: Params) -> Params:
    return jax.tree.map(
        lambda a, b: a if a is not None else b,
        train,
        frozen,
        is_leaf=lambda x: x is None,
    )


def ref_model_tree(frozen: Params, overrides: Optional[Params]) -> Params:
    """The frozen REFERENCE model derived from the policy's frozen
    sub-tree: strip the None placeholders (LoRA factors and any tuned
    components), overlay `overrides` (original copies of components that
    ARE trainable, e.g. the initial projector under mm_projector_lr).

    Rationale: under the default LoRA recipe the reference model IS the
    policy base, so passing a second full param tree to jit makes the
    compile-time HBM accounting count the 7B weights twice (measured:
    the llava-7b step 'used' 17.7G of which ~7G was the aliased ref
    arg) — deriving it from `frozen` inside the jitted step costs zero
    extra parameters. This replaces the reference's second DeepSpeed
    engine (_prepare_deepspeed, halva_trainer.py:231-259).
    """

    def strip(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                sv = strip(v)
                if sv is not None:
                    out[k] = sv
            return out or None
        if isinstance(node, (list, tuple)):
            vals = [strip(v) for v in node]
            if any(v is None for v in vals):
                return None  # partially-trainable list: needs an override
            return type(node)(vals)
        return node

    ref = strip(frozen) or {}
    if overrides:
        for k, v in overrides.items():
            ref[k] = v
    for comp in ("llm", "vision", "projector"):
        if comp not in ref:
            raise ValueError(
                f"reference model is missing {comp!r}: component is "
                "trainable, so pass its original copy via ref overrides"
            )
    return ref


# --------------------------------------------------------------------------
# Optimizer
# --------------------------------------------------------------------------


def lr_schedule(tcfg: TrainConfig, base_lr: float) -> optax.Schedule:
    warmup = max(int(tcfg.warmup_ratio * tcfg.num_train_steps), 1)
    total = max(tcfg.num_train_steps, warmup + 1)
    if tcfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, base_lr, warmup, total, end_value=0.0
        )
    if tcfg.lr_schedule == "linear":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, base_lr, warmup),
                optax.linear_schedule(
                    base_lr, 0.0, tcfg.num_train_steps - warmup
                ),
            ],
            [warmup],
        )
    return optax.constant_schedule(base_lr)


def make_optimizer(
    tcfg: TrainConfig, trainable: Params
) -> optax.GradientTransformation:
    """AdamW over the trainable sub-tree; projector params get their own
    lr when mm_projector_lr is set (reference create_optimizer param
    groups, halva_trainer.py:276-363)."""

    def scale_by_moments():
        if tcfg.optim == "adamw8bit":
            from halva_tpu.train.optim8bit import scale_by_adam8bit

            return scale_by_adam8bit(
                b1=tcfg.adam_b1, b2=tcfg.adam_b2, eps=tcfg.adam_eps
            )
        if tcfg.optim != "adamw":
            raise ValueError(f"unknown optim {tcfg.optim!r}")
        return optax.scale_by_adam(
            b1=tcfg.adam_b1, b2=tcfg.adam_b2, eps=tcfg.adam_eps
        )

    def adamw(lr):
        return optax.chain(
            optax.clip_by_global_norm(tcfg.max_grad_norm),
            scale_by_moments(),
            optax.add_decayed_weights(tcfg.weight_decay),
            optax.scale_by_schedule(lr_schedule(tcfg, lr)),
            optax.scale(-1.0),
        )

    if tcfg.mm_projector_lr:
        def label(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)

            def lab(kp):
                parts = [
                    str(k.key) for k in kp if hasattr(k, "key")
                ]
                return (
                    "projector" if "projector" in parts else "base"
                )

            leaves = [lab(kp) for kp, _ in flat[0]]
            return jax.tree_util.tree_unflatten(flat[1], leaves)

        tx = optax.multi_transform(
            {
                "base": adamw(tcfg.learning_rate),
                "projector": adamw(tcfg.mm_projector_lr),
            },
            label,
        )
    else:
        tx = adamw(tcfg.learning_rate)

    if tcfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tcfg.grad_accum_steps)
    return tx


# --------------------------------------------------------------------------
# Train step
# --------------------------------------------------------------------------


class TrainMetrics(NamedTuple):
    loss: jnp.ndarray
    alignment: jnp.ndarray
    divergence: jnp.ndarray
    grad_norm: jnp.ndarray


def dpa_step_fns(
    cfg: LlavaConfig,
    tcfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
):
    """Build (train_step, eval_loss) jittable closures.

    train_step(trainable, frozen, ref_params, opt_state, batch)
      -> (new_trainable, new_opt_state, TrainMetrics)
    """

    chunked = tcfg.loss_chunk is not None
    # batch-over-"data" sharding constraint, applied per layer in the
    # decoder scan and through the chunked loss — see
    # dpa._batch_constrainer and llama.forward_embeds(constrain=...)
    batch_constrain = (
        dpa._batch_constrainer(mesh, 0) if mesh is not None else None
    )

    def forwards(params: Params, batch: Dict[str, jnp.ndarray]):
        # one 2B-row batched forward for pos+neg (reference
        # concatenated_forward, halva_trainer.py:421-489)
        input_ids = jnp.concatenate(
            [batch["input_ids"], batch["neg_input_ids"]], axis=0
        )
        seg = jnp.concatenate(
            [batch["segment_ids"], batch["neg_segment_ids"]], axis=0
        )
        labels = jnp.concatenate(
            [batch["labels"], batch["neg_labels"]], axis=0
        )
        signs = jnp.concatenate(
            [batch["pos_signs"], batch["neg_signs"]], axis=0
        )
        images = jnp.concatenate(
            [batch["images"], batch["images"]], axis=0
        )
        out, sp = llava.forward(
            params,
            cfg,
            input_ids,
            images,
            segment_ids=seg,
            labels=labels,
            signs=signs,
            attn_impl=tcfg.attn_impl,
            remat=tcfg.remat,
            return_hidden=chunked,
            constrain=batch_constrain,
        )
        b = batch["input_ids"].shape[0]
        return (
            out[:b],
            out[b:],
            sp.labels[:b],
            sp.labels[b:],
            sp.signs[:b],
            sp.signs[b:],
        )

    def ref_forward(params: Params, batch: Dict[str, jnp.ndarray]):
        out, sp = llava.forward(
            params,
            cfg,
            batch["ref_input_ids"],
            batch["ref_images"],
            segment_ids=batch["ref_segment_ids"],
            labels=batch["ref_labels"],
            attn_impl=tcfg.attn_impl,
            remat=tcfg.remat,
            return_hidden=chunked,
            constrain=batch_constrain,
        )
        return out, sp.labels

    def loss_fn(
        trainable: Params,
        frozen: Params,
        frozen_ref_out: jnp.ndarray,
        ref_labels_spliced: jnp.ndarray,
        batch: Dict[str, jnp.ndarray],
    ):
        params = combine_params(trainable, frozen)
        (
            pos_out,
            neg_out,
            pos_labels,
            neg_labels,
            pos_signs,
            neg_signs,
        ) = forwards(params, batch)
        policy_ref_out, _ = ref_forward(params, batch)
        if chunked:
            # lm_head is shared policy/frozen (LoRA excludes lm_head,
            # reference find_all_linear_names, train_halva.py:156-169)
            from halva_tpu.models import llama as llama_lib

            llm = params["llm"]

            def logits_fn(h):
                return llama_lib.lm_logits(llm, cfg.llm, h)

            parts = dpa.dpa_loss_from_hidden(
                logits_fn,
                pos_out,
                neg_out,
                pos_labels,
                neg_labels,
                pos_signs,
                neg_signs,
                policy_ref_out,
                frozen_ref_out,  # hidden states in chunked mode
                ref_labels_spliced,
                alpha=tcfg.loss_alpha,
                max_phrases=tcfg.max_phrases,
                chunk=tcfg.loss_chunk,
                mesh=mesh,
            )
        else:
            parts = dpa.dpa_loss(
                pos_out,
                neg_out,
                pos_labels,
                neg_labels,
                pos_signs,
                neg_signs,
                policy_ref_out,
                frozen_ref_out,
                ref_labels_spliced,
                alpha=tcfg.loss_alpha,
                max_phrases=tcfg.max_phrases,
            )
        return parts.total, parts

    def loss_and_grads(trainable, frozen, ref_params, batch):
        """The exact quantity train_step differentiates, exposed for
        diagnostics (scripts/quant_quality_train.py measures frozen-
        base-quantization damage to this gradient). frozen reference
        model forward is independent of the trainable leaves — computed
        once outside the grad; ref_params may be None (derive fully
        from `frozen` — the zero-copy default), a partial overrides
        dict, or a full tree (legacy; see ref_model_tree)."""
        frozen_ref_out, ref_labels_spliced = ref_forward(
            ref_model_tree(frozen, ref_params), batch
        )
        frozen_ref_out = jax.lax.stop_gradient(frozen_ref_out)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable,
            frozen,
            frozen_ref_out,
            ref_labels_spliced,
            batch,
        )
        return loss, parts, grads

    def train_step(trainable, frozen, ref_params, opt_state, batch):
        loss, parts, grads = loss_and_grads(
            trainable, frozen, ref_params, batch
        )
        updates, new_opt_state = optimizer.update(
            grads, opt_state, trainable
        )
        new_trainable = optax.apply_updates(trainable, updates)
        gnorm = optax.global_norm(grads)
        return (
            new_trainable,
            new_opt_state,
            TrainMetrics(loss, parts.alignment, parts.divergence, gnorm),
        )

    def eval_loss(trainable, frozen, ref_params, batch):
        frozen_ref_out, ref_labels_spliced = ref_forward(
            ref_model_tree(frozen, ref_params), batch
        )
        loss, parts = loss_fn(
            trainable,
            frozen,
            jax.lax.stop_gradient(frozen_ref_out),
            ref_labels_spliced,
            batch,
        )
        return TrainMetrics(
            loss, parts.alignment, parts.divergence, jnp.zeros(())
        )

    # non-breaking diagnostics hook (see loss_and_grads docstring)
    train_step.loss_and_grads = loss_and_grads
    return train_step, eval_loss


def packed_dpa_step_fns(
    cfg: LlavaConfig,
    tcfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    max_samples: int,
    mesh=None,
):
    """Packed-batch twin of dpa_step_fns (batches from
    train/pack.PackedDPABatcher): pos+neg documents share one row set
    and ONE vision forward per unique image; the loss keys phrase
    accumulation by per-token sample ids. Always runs the chunked-logits
    path (loss_chunk defaults to 256 when unset) — packed rows exist to
    run at full 2048-token density, where full (R, S, V) logits would
    not fit beside 7B weights anyway."""
    chunk = tcfg.loss_chunk or 256
    batch_constrain = (
        dpa._batch_constrainer(mesh, 0) if mesh is not None else None
    )

    def pn_forward(params: Params, batch):
        return llava.forward_packed(
            params,
            cfg,
            batch["pn_input_ids"],
            batch["images"],
            batch["pn_img_src"],
            batch["pn_img_row"],
            batch["pn_img_col"],
            batch["pn_segment_ids"],
            batch["pn_positions"],
            attn_impl=tcfg.attn_impl,
            remat=tcfg.remat,
            return_hidden=True,
            constrain=batch_constrain,
        )

    def ref_forward(params: Params, batch):
        return llava.forward_packed(
            params,
            cfg,
            batch["ref_input_ids"],
            batch["images"],
            batch["ref_img_src"],
            batch["ref_img_row"],
            batch["ref_img_col"],
            batch["ref_segment_ids"],
            batch["ref_positions"],
            attn_impl=tcfg.attn_impl,
            remat=tcfg.remat,
            return_hidden=True,
            constrain=batch_constrain,
        )

    def loss_fn(trainable, frozen, frozen_ref_hidden, batch):
        params = combine_params(trainable, frozen)
        pn_hidden = pn_forward(params, batch)
        policy_ref_hidden = ref_forward(params, batch)
        from halva_tpu.models import llama as llama_lib

        llm = params["llm"]

        def logits_fn(h):
            return llama_lib.lm_logits(llm, cfg.llm, h)

        parts = dpa.dpa_loss_from_hidden_packed(
            logits_fn,
            pn_hidden,
            batch["pn_labels"],
            batch["pn_signs"],
            batch["pn_sample_ids"],
            batch["pn_neg_flags"],
            policy_ref_hidden,
            frozen_ref_hidden,
            batch["ref_labels"],
            batch["n_samples"],
            alpha=tcfg.loss_alpha,
            max_samples=max_samples,
            max_phrases=tcfg.max_phrases,
            chunk=chunk,
            mesh=mesh,
        )
        return parts.total, parts

    def train_step(trainable, frozen, ref_params, opt_state, batch):
        frozen_ref_hidden = jax.lax.stop_gradient(
            ref_forward(ref_model_tree(frozen, ref_params), batch)
        )
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, frozen_ref_hidden, batch
        )
        updates, new_opt_state = optimizer.update(
            grads, opt_state, trainable
        )
        new_trainable = optax.apply_updates(trainable, updates)
        gnorm = optax.global_norm(grads)
        return (
            new_trainable,
            new_opt_state,
            TrainMetrics(loss, parts.alignment, parts.divergence, gnorm),
        )

    def eval_loss(trainable, frozen, ref_params, batch):
        frozen_ref_hidden = jax.lax.stop_gradient(
            ref_forward(ref_model_tree(frozen, ref_params), batch)
        )
        loss, parts = loss_fn(trainable, frozen, frozen_ref_hidden, batch)
        return TrainMetrics(
            loss, parts.alignment, parts.divergence, jnp.zeros(())
        )

    return train_step, eval_loss


def init_train_state(
    params: Params,
    tcfg: TrainConfig,
    extra_trainable: Tuple[str, ...] = (),
):
    """Split params, build optimizer + state. Returns
    (trainable, frozen, optimizer, opt_state)."""
    if tcfg.mm_projector_lr:
        extra_trainable = extra_trainable + (r"^projector/",)
    mask = trainable_mask(params, extra_trainable=extra_trainable)
    trainable, frozen = split_params(params, mask)
    optimizer = make_optimizer(tcfg, trainable)
    opt_state = optimizer.init(trainable)
    return trainable, frozen, optimizer, opt_state
