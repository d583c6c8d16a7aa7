"""HALVA DPA training entry point (the reference's train_halva.py train()).

Orchestration only — all device math lives in trainer.py. The flow
(reference llava/train/train_halva.py:1179-1243):
  build policy (base + LoRA) and frozen reference model -> dataset ->
  train loop (grad-accum, cosine lr, checkpoint/resume) -> adapter save.

Differences by design:
- one process drives the whole slice (jit over Mesh), not one rank/GPU;
- the frozen ref model is just a second param tree (no 2nd engine);
- resume is an orbax step restore, not HF checkpoint dirs.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp

from halva_tpu.config import LlavaConfig, PRESETS
from halva_tpu.mm_utils import processor_for_vision
from halva_tpu.models import llava
from halva_tpu.parallel import mesh as mesh_lib
from halva_tpu.parallel import partition
from halva_tpu.train import checkpoint as ckpt_lib
from halva_tpu.train import lora as lora_lib
from halva_tpu.train import sampler as sampler_lib
from halva_tpu.train import trainer as trainer_lib
from halva_tpu.train.data import HallDataset, collate
from halva_tpu.utils.logging import MetricsLogger, StepTimer, log0


@dataclasses.dataclass
class RunConfig:
    model: str = "llava-v1.5-7b"  # preset name
    model_path: Optional[str] = None  # orbax dir of converted base params
    output_dir: str = "out/halva"
    data_path: str = "data/data.json"
    ref_data_path: Optional[str] = "data/ref_data.json"
    image_folder: str = ""
    # recipe (src/hallava_7b.sh)
    epochs: float = 1.0
    max_steps: Optional[int] = None  # hard micro-step cap (HF max_steps)
    per_device_batch: int = 4
    grad_accum_steps: int = 4
    learning_rate: float = 5e-6
    mm_projector_lr: Optional[float] = None
    optim: str = "adamw"  # adamw | adamw8bit (bnb Adam8bit equivalent)
    loss_alpha: float = 0.4
    lora_r: int = 128
    lora_alpha: float = 256.0
    warmup_ratio: float = 0.03
    weight_decay: float = 0.0
    max_length: int = 2048
    seed: int = 42
    save_steps: int = 50000
    log_every: int = 1
    dtype: str = "bfloat16"
    mesh_data: Optional[int] = None
    mesh_model: int = 1
    resume: bool = True
    metrics_path: Optional[str] = None
    # VILA-variant knobs (train/vila.py; reference vila/train/
    # train_halva.py:340-346 component flags + builder.py:43-51 RoPE ext)
    tune_language_model: bool = False
    tune_vision_tower: bool = False
    tune_mm_projector: bool = False
    model_max_length: Optional[int] = None  # RoPE linear ctx extension
    save_component_dirs: bool = False  # llm/ vision_tower/ mm_projector/
    # vocab extension (reference initialize_vision_tokenizer,
    # llava/model/llava_arch.py:398-440: add <im_start>/<im_end> (and
    # optionally <im_patch>) with mean-init embedding rows)
    mm_use_im_start_end: bool = False
    mm_use_im_patch_token: bool = False
    # sequence packing (train/pack.py): many samples per fixed-shape row
    # set; throughput tracks real tokens instead of max_length. The
    # TPU-native replacement for the reference's longest-in-batch
    # padding (train_halva.py:897-961).
    pack: bool = False
    pack_rows: Optional[int] = None  # pos+neg rows/step (default B_global)
    pack_ref_rows: Optional[int] = None  # default ceil(pack_rows / 2)
    pack_seq_len: Optional[int] = None  # default max_length + T - 1 (^64)


def build_models(rcfg: RunConfig, cfg: LlavaConfig, tokenizer=None):
    """Base params (from a converted checkpoint dir, else random init for
    smoke runs) + LoRA policy + frozen reference copy. Returns
    (policy, base, cfg) — cfg may gain vocab rows when
    mm_use_im_start_end/mm_use_im_patch_token extend the tokenizer
    (models/vocab.py; reference llava_arch.py:398-440)."""
    dtype = jnp.bfloat16 if rcfg.dtype == "bfloat16" else jnp.float32
    if rcfg.model_path:
        like = jax.eval_shape(
            lambda: llava.init_params(jax.random.PRNGKey(0), cfg, dtype)
        )
        base = ckpt_lib.load_params(rcfg.model_path, like)
    else:
        log0("no model_path given — random init (smoke mode)")
        base = llava.init_params(jax.random.PRNGKey(0), cfg, dtype)
    if tokenizer is not None and (
        rcfg.mm_use_im_start_end or rcfg.mm_use_im_patch_token
    ):
        from halva_tpu.models.vocab import extend_tokenizer_and_embeddings

        base, cfg, n_new = extend_tokenizer_and_embeddings(
            base,
            cfg,
            tokenizer,
            mm_use_im_patch_token=rcfg.mm_use_im_patch_token,
            mm_use_im_start_end=rcfg.mm_use_im_start_end,
        )
        if n_new:
            log0("vocab extended by %d tokens (mean-init rows)", n_new)
    policy = lora_lib.add_lora(
        base,
        jax.random.PRNGKey(rcfg.seed),
        rank=rcfg.lora_r,
        alpha=rcfg.lora_alpha,
    )
    return policy, base, cfg  # ref model shares the base tree (frozen)


def train(rcfg: RunConfig, tokenizer, dataset: Optional[Any] = None):
    cfg = PRESETS.get(rcfg.model)
    if not isinstance(cfg, LlavaConfig):
        llava_presets = sorted(
            k for k, v in PRESETS.items() if isinstance(v, LlavaConfig)
        )
        raise ValueError(
            f"unknown LLaVA preset {rcfg.model!r}; choose one of "
            f"{llava_presets}"
        )

    if rcfg.model_max_length:
        from halva_tpu.train import vila as vila_lib

        cfg = dataclasses.replace(
            cfg,
            llm=vila_lib.context_length_extension(
                cfg.llm, rcfg.model_max_length
            ),
        )

    mesh = mesh_lib.make_mesh(data=rcfg.mesh_data, model=rcfg.mesh_model)
    log0("mesh: %s", dict(mesh.shape))

    if dataset is None:
        dataset = HallDataset(
            rcfg.data_path,
            rcfg.ref_data_path,
            tokenizer,
            processor_for_vision(cfg.vision),
            image_folder=rcfg.image_folder,
            max_length=rcfg.max_length,
            seed=rcfg.seed,
        )

    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    global_batch = rcfg.per_device_batch * n_data
    steps_per_epoch = len(dataset) // global_batch
    num_opt_steps = int(rcfg.epochs * steps_per_epoch / rcfg.grad_accum_steps)
    num_micro_steps = num_opt_steps * rcfg.grad_accum_steps
    if rcfg.pack:
        # packed batches hold a VARIABLE number of samples (<=
        # global_batch), so the sample-count cadence above undercounts
        # packed steps whenever row capacity binds first; bounding the
        # loop by it would silently drop each epoch's tail. The epoch
        # budget lives in the index stream itself (epoch_indices yields
        # exactly rcfg.epochs passes) — run until it drains. The LR
        # schedule keeps the sample-count horizon (a lower bound): the
        # cosine tail flattens at min-lr for the overshoot steps.
        stop_at = rcfg.max_steps or float("inf")
    else:
        stop_at = (
            min(num_micro_steps, rcfg.max_steps)
            if rcfg.max_steps
            else num_micro_steps
        )

    tcfg = trainer_lib.TrainConfig(
        learning_rate=rcfg.learning_rate,
        mm_projector_lr=rcfg.mm_projector_lr,
        optim=rcfg.optim,
        warmup_ratio=rcfg.warmup_ratio,
        weight_decay=rcfg.weight_decay,
        loss_alpha=rcfg.loss_alpha,
        grad_accum_steps=rcfg.grad_accum_steps,
        num_train_steps=num_opt_steps,
    )

    policy, _base, cfg = build_models(rcfg, cfg, tokenizer)
    extra_trainable = []
    if rcfg.tune_language_model:
        extra_trainable.append(r"^llm/")
    if rcfg.tune_vision_tower:
        extra_trainable.append(r"^vision/")
    if rcfg.tune_mm_projector:
        extra_trainable.append(r"^projector/")
    trainable, frozen, optimizer, opt_state = trainer_lib.init_train_state(
        policy, tcfg, extra_trainable=tuple(extra_trainable)
    )
    # place on mesh
    shard = lambda t: jax.tree.map(
        jax.device_put, t, partition.param_shardings(t, mesh)
    )
    trainable, frozen = shard(trainable), shard(frozen)
    opt_state = shard(opt_state)
    # the frozen reference model is DERIVED from `frozen` inside the step
    # (trainer.ref_model_tree) — no second 13GB tree on device. Trainable
    # components beyond LoRA need their ORIGINAL copies overlaid; snapshot
    # the initial (sharded) arrays — functional updates never mutate them.
    initial = trainer_lib.combine_params(trainable, frozen)

    def snapshot(t):
        # REAL copies: trainable buffers are donated to the step, and an
        # aliased second use raises `f(donate(a), a)` at execute time
        return jax.tree.map(jnp.copy, t)

    ref_overrides = {}
    if rcfg.mm_projector_lr or rcfg.tune_mm_projector:
        ref_overrides["projector"] = snapshot(initial["projector"])
    if rcfg.tune_vision_tower:
        ref_overrides["vision"] = snapshot(initial["vision"])
    if rcfg.tune_language_model:
        ref_overrides["llm"] = snapshot(initial["llm"])
    ref_params = ref_overrides or None
    del initial, _base

    if rcfg.pack:
        from halva_tpu.train.pack import PackedDPABatcher

        def _r64(n):
            return -(-n // 64) * 64

        def _rdata(n):
            return -(-n // n_data) * n_data

        pack_seq = rcfg.pack_seq_len or _r64(
            rcfg.max_length + cfg.num_image_tokens - 1
        )
        pack_rows = _rdata(rcfg.pack_rows or global_batch)
        pack_ref_rows = _rdata(
            rcfg.pack_ref_rows or max(1, pack_rows // 2)
        )
        max_samples = global_batch
        batcher = PackedDPABatcher(
            seq_len=pack_seq,
            pn_rows=pack_rows,
            ref_rows=pack_ref_rows,
            max_samples=max_samples,
            num_image_tokens=cfg.num_image_tokens,
            pad_token_id=0,
            image_shape=(3, cfg.vision.image_size, cfg.vision.image_size),
        )
        log0(
            "packing: %d pn + %d ref rows x %d, <= %d samples/step",
            pack_rows, pack_ref_rows, pack_seq, max_samples,
        )
        step_fn, _ = trainer_lib.packed_dpa_step_fns(
            cfg, tcfg, optimizer, max_samples=max_samples, mesh=mesh
        )
    else:
        batcher = None
        step_fn, _ = trainer_lib.dpa_step_fns(
            cfg, tcfg, optimizer, mesh=mesh
        )
    step_fn = jax.jit(step_fn, donate_argnums=(0, 3))

    mgr = ckpt_lib.CheckpointManager(
        os.path.join(rcfg.output_dir, "checkpoints")
    )
    start_step = 0
    if rcfg.resume and mgr.latest_step() is not None:
        # concrete sharded trees as restore templates: orbax restores
        # each array with the template's sharding
        trainable, opt_state, start_step = mgr.restore(
            trainable, opt_state
        )
        log0("resumed from step %d", start_step)

    metrics = MetricsLogger(
        rcfg.metrics_path
        or os.path.join(rcfg.output_dir, "metrics.jsonl")
    )
    timer = StepTimer()

    # index stream: modality length grouping, fresh shuffle per epoch,
    # host-sharded; on resume the first `start_step` micro-batches are
    # skipped so a resumed run continues the SAME data stream instead of
    # replaying from sample 0 (HF Trainer skip_first_batches semantics)
    order = sampler_lib.epoch_indices(
        dataset.modality_lengths,
        rcfg.per_device_batch,
        n_data,
        rcfg.epochs,
        seed=rcfg.seed,
    )
    host_batches = sampler_lib.host_shard_batches(
        order,
        global_batch,
        jax.process_index(),
        jax.process_count(),
    )
    if start_step and batcher is None:
        import itertools

        host_batches = itertools.islice(host_batches, start_step, None)

    from halva_tpu.utils.cluster import PreemptionWatcher, WallClockGuard

    watcher = PreemptionWatcher(
        sentinel_path=os.path.join(rcfg.output_dir, "STOP")
    )
    wall = WallClockGuard.from_env()

    from halva_tpu.utils.prefetch import prefetch

    def host_batch_stream():
        """Dataset fetch + collate on a background thread (the reference's
        DataLoader workers)."""
        if batcher is not None:
            def items():
                for batch_idx in host_batches:
                    for i in batch_idx:
                        yield dataset[i]

            stream = batcher.batches(items())
            if start_step:
                # resume skips PACKED batches (micro counts those):
                # packing is deterministic over the same index order, so
                # replaying the first start_step packed batches lands on
                # the exact sample the interrupted run would see next.
                # An index-level skip (the unpacked path's islice) would
                # misalign — a packed batch consumes a VARIABLE number
                # of samples.
                import itertools

                stream = itertools.islice(stream, start_step, None)
            yield from stream
            return
        for batch_idx in host_batches:
            samples = [dataset[i] for i in batch_idx]
            samples = [s for s in samples if s is not None]
            if not samples:
                continue
            yield collate(samples, pad_token_id=0)

    micro = start_step
    t_train0 = time.time()
    for host_batch in prefetch(host_batch_stream(), depth=2):
        if micro >= stop_at:
            break
        if watcher.should_stop(micro) or wall.should_stop():
            log0("preemption/timeout: checkpoint + stop at step %d", micro)
            mgr.save(micro, trainable, opt_state)
            break
        batch = (
            partition.shard_packed_batch(host_batch, mesh)
            if batcher is not None
            else partition.shard_batch(host_batch, mesh)
        )
        trainable, opt_state, m = step_fn(
            trainable, frozen, ref_params, opt_state, batch
        )
        micro += 1
        timer.tick()
        if micro % rcfg.log_every == 0:
            metrics.log(
                micro,
                {
                    "loss": m.loss,
                    "alignment": m.alignment,
                    "kl": m.divergence,
                    "grad_norm": m.grad_norm,
                    "step_time": timer.avg or 0.0,
                },
            )
        if micro % rcfg.save_steps == 0:
            mgr.save(micro, trainable, opt_state)

    if micro == 0:
        raise RuntimeError(
            "no training steps ran: every batch was dropped or the "
            "dataset is smaller than one global batch "
            f"(len(dataset)={len(dataset)}, global_batch={global_batch}). "
            "Dropped samples usually mean the tokenizer cannot be "
            "char-aligned (needs byte-fallback pieces or offsets) — see "
            "train/data.py:token_char_offsets."
        )
    log0("training done in %.1f min", (time.time() - t_train0) / 60)
    mgr.save(micro, trainable, opt_state)

    # adapter-only export (reference adapter + non_lora_trainables save)
    final = trainer_lib.combine_params(trainable, frozen)
    adapter = lora_lib.lora_state_dict(final)
    ckpt_lib.save_adapter(
        os.path.join(rcfg.output_dir, "adapter.npz"), adapter
    )
    log0("saved adapter with %d tensors", len(adapter))
    if rcfg.save_component_dirs:
        from halva_tpu.train import vila as vila_lib

        vila_lib.save_components(
            os.path.join(rcfg.output_dir, "components"), final, cfg
        )
        log0("saved per-component checkpoints (llm/vision_tower/"
             "mm_projector)")
    metrics.close()
    mgr.close()
    return final


def main(argv=None):
    import argparse

    from halva_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description="HALVA DPA training (TPU)")
    # argument types derived from annotations (Optional[float] etc.)
    kinds = {
        "epochs": float, "learning_rate": float, "loss_alpha": float,
        "lora_alpha": float, "warmup_ratio": float, "weight_decay": float,
        "mm_projector_lr": float,
        "per_device_batch": int, "grad_accum_steps": int, "lora_r": int,
        "max_length": int, "seed": int, "save_steps": int, "max_steps": int,
        "model_max_length": int,
        "log_every": int, "mesh_data": int, "mesh_model": int,
        "pack_rows": int, "pack_ref_rows": int, "pack_seq_len": int,
    }
    for f in dataclasses.fields(RunConfig):
        name = "--" + f.name.replace("_", "-")
        if isinstance(f.default, bool):
            p.add_argument(name, type=lambda x: x.lower() == "true",
                           default=f.default)
        elif f.name in kinds:
            p.add_argument(name, type=kinds[f.name], default=f.default)
        else:
            p.add_argument(name, default=f.default)
    args = p.parse_args(argv)
    rcfg = RunConfig(**vars(args))

    from transformers import AutoTokenizer

    tok_path = os.environ.get("HALVA_TOKENIZER", "lmsys/vicuna-7b-v1.5")
    try:
        # the reference loads the slow tokenizer (train_halva.py:1103)
        tok = AutoTokenizer.from_pretrained(tok_path, use_fast=False)
    except (ImportError, ValueError, OSError):
        # slow Llama tokenizers need sentencepiece; fall back to the fast
        # tokenizer (identical ids for Llama vocabularies)
        tok = AutoTokenizer.from_pretrained(tok_path, use_fast=True)
    tok.pad_token = tok.unk_token or tok.eos_token
    train(rcfg, tok)


if __name__ == "__main__":
    main()
