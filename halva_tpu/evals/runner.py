"""Batched evaluation generation driver.

Replaces the reference's one-process-per-GPU bs=1 loaders
(eval_hall/model_vqa_loader.py:31-130, model_chair_loader.py,
model_amber_loader.py, model_vqa_mmhal.py) with a single driver that
buckets prompts by length and runs batched KV-cached decode — greedy,
nucleus sampling (temperature/top_p), or beam search (num_beams/
length_penalty) — on the whole TPU slice; the designed >=2x A100
imgs/sec path (BASELINE.md).

Answers are written as flushed JSONL rows with the reference's schema
(question_id/prompt/text/answer_id/model_id) so every metric computer and
the original scoring scripts consume them unchanged. `--num-chunks /
--chunk-idx` splitting is kept for multi-slice fanout parity.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import uuid
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

import jax.numpy as jnp

from halva_tpu.config import LlavaConfig
from halva_tpu.constants import DEFAULT_IMAGE_TOKEN
from halva_tpu.conversation import get_template
from halva_tpu.mm_utils import (
    ImageProcessor,
    process_images,
    tokenizer_image_token,
)
from halva_tpu.ops.generate import decode_tokens, generate

CHAIR_PROMPT = "Describe the image in detail."
_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def chair500_image_list() -> List[str]:
    with open(os.path.join(_DATA_DIR, "chair500.json")) as f:
        return json.load(f)


def split_chunk(lst: Sequence, num_chunks: int, chunk_idx: int) -> List:
    """Reference get_chunk (model_vqa_loader.py:19-27)."""
    import math

    size = math.ceil(len(lst) / num_chunks)
    chunks = [
        list(lst[i : i + size]) for i in range(0, len(lst), size)
    ]
    while len(chunks) < num_chunks:
        chunks.append([])
    return chunks[chunk_idx]


@dataclasses.dataclass
class EvalRequest:
    question_id: Any
    text: str  # raw question text (no image marker)
    image_path: Optional[str]  # None = text-only (HallusionBench VS rows)
    extra: Dict[str, Any] = dataclasses.field(default_factory=dict)


def build_prompt(
    text: str,
    template_name: str = "v1",
    mm_use_im_start_end: bool = False,
    with_image: bool = True,
) -> str:
    qs = text
    if with_image:
        if mm_use_im_start_end:
            qs = "<im_start>" + DEFAULT_IMAGE_TOKEN + "<im_end>" + "\n" + qs
        else:
            qs = DEFAULT_IMAGE_TOKEN + "\n" + qs
    return get_template(template_name).prompt(qs)


class BatchedGenerator:
    """Length-bucketed batched decode over a prepared model: greedy by
    default, nucleus sampling when temperature > 0, beam search when
    num_beams > 1 (the reference loaders' full generate surface)."""

    def __init__(
        self,
        params: Dict,
        cfg: LlavaConfig,
        tokenizer,
        image_processor: ImageProcessor,
        image_aspect_ratio: str = "pad",
        template_name: str = "v1",
        batch_size: int = 8,
        max_new_tokens: int = 1024,
        prompt_bucket: int = 64,
        attn_impl: str = "auto",
        temperature: float = 0.0,
        top_p: float = 1.0,
        num_beams: int = 1,
        length_penalty: float = 1.0,
        seed: int = 0,
        mesh=None,
        prefetch_workers: int = 0,
        kv_quant=False,  # False | 'int8' | 'int4'
        continuous: bool = False,
        spec_k: int = 0,  # >= 2: speculative greedy decode
    ):
        if spec_k >= 2 and (
            num_beams > 1 or temperature > 0 or continuous
            or mesh is not None
        ):
            raise ValueError(
                "--spec is single-device greedy decode "
                "(ops/speculative.py); drop --num-beams/--temperature/"
                "--continuous/--mesh-*"
            )
        if continuous and (num_beams > 1 or temperature > 0):
            raise ValueError(
                "--continuous is greedy single-beam decode "
                "(ops/continuous.py); drop --num-beams/--temperature"
            )
        if continuous and mesh is not None:
            raise ValueError(
                "--continuous currently runs single-device; drop "
                "--mesh-data/--mesh-model or use --num-chunks fanout"
            )
        if (
            num_beams > 1
            and mesh is not None
            and mesh.shape.get("model", 1) > 1
        ):
            raise ValueError(
                "num_beams > 1 supports {data: N} meshes only "
                "(ops/beam.py); drop --mesh-model or use --num-chunks "
                "process fanout for tensor-parallel beam eval"
            )
        if num_beams > 1 and temperature > 0:
            raise ValueError("beam search is deterministic; drop "
                             "--temperature or --num-beams")
        if mesh is not None:
            dp = mesh.shape.get("data", 1)
            if batch_size % dp != 0:
                raise ValueError(
                    f"batch_size {batch_size} must be a multiple of "
                    f"the mesh data axis size ({dp})"
                )
            from halva_tpu.parallel import partition

            # place weights ONCE in the layout generate's jit expects —
            # a mismatched committed sharding would reshard the whole
            # tree on every dispatch. partition.manual_tp_route is the
            # SAME decision ops/generate.generate makes.
            if (
                partition.manual_tp_route(params, cfg, mesh)
                or mesh.shape.get("model", 1) == 1
            ):
                params = partition.eval_shmap_shard_params(params, mesh)
            else:
                params = partition.eval_shard_params(params, mesh)
        self.mesh = mesh
        self.prefetch_workers = prefetch_workers
        self.kv_quant = kv_quant
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.proc = image_processor
        self.aspect = image_aspect_ratio
        self.template = template_name
        self.batch_size = batch_size
        self.max_new_tokens = max_new_tokens
        self.bucket = prompt_bucket
        self.attn_impl = attn_impl
        self.temperature = temperature
        self.top_p = top_p
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.seed = seed
        self.eos_id = tokenizer.eos_token_id
        self.continuous = continuous
        self.spec_k = spec_k

    def _tokenize(self, req: EvalRequest):
        prompt = build_prompt(
            req.text,
            self.template,
            mm_use_im_start_end=getattr(
                self.cfg, "mm_use_im_start_end", False
            ),
            with_image=req.image_path is not None,
        )
        return tokenizer_image_token(prompt, self.tok)

    def _load_image(self, req: EvalRequest):
        if req.image_path is not None:
            img = Image.open(req.image_path).convert("RGB")
            return process_images([img], self.proc, self.aspect)[0]
        # text-only: zero image; the splice masks the image block for
        # rows without the sentinel
        sz = self.proc.crop_size
        return np.zeros((3, sz, sz), np.float32)

    def _build_batch(self, requests, ids_all, idxs, pool):
        """Host work for one batch: image decode + pad. Tail batches pad
        with DEAD rows (prompt_length 0, zero image) — generate() marks
        them done at step 0, so no real row is ever decoded twice
        (replaces the old tile-the-last-row padding: up to B-1 duplicate
        decodes on short eval sets like MMHal's 96 questions)."""
        t0 = time.perf_counter()
        if pool is not None:
            imgs_l = list(
                pool.map(lambda i: self._load_image(requests[i]), idxs)
            )
        else:
            imgs_l = [self._load_image(requests[i]) for i in idxs]
        ids_list = [ids_all[i] for i in idxs]
        lens = np.array([len(x) for x in ids_list], np.int32)
        tgt = -(-int(lens.max()) // self.bucket) * self.bucket
        batch_ids = np.zeros((len(idxs), tgt), np.int32)
        for j, ids in enumerate(ids_list):
            batch_ids[j, : len(ids)] = ids
        imgs = np.stack(imgs_l).astype(np.float32)
        nb = self.batch_size
        if len(idxs) < nb:
            pad = nb - len(idxs)
            batch_ids = np.concatenate(
                [batch_ids, np.zeros((pad, tgt), np.int32)]
            )
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], np.float32)]
            )
            lens = np.concatenate([lens, np.zeros(pad, np.int32)])
        host_s = time.perf_counter() - t0
        return idxs, batch_ids, imgs, lens, host_s

    def _run_continuous(self, requests, on_result):
        """EOS-freed slot refill (ops/continuous.py): the longest
        caption no longer gates the whole batch — the decode pays
        ~mean caption length per row instead of the batch max (round-4
        verdict item 5). Greedy, single-device; token-parity with the
        one-shot program is pinned by tests/test_continuous.py."""
        import os as _os

        from halva_tpu.ops.continuous import ContinuousEngine, Request

        t_all = time.perf_counter()
        ids_all = [self._tokenize(r) for r in requests]
        max_len = max((len(x) for x in ids_all), default=1)
        pad = -(-max_len // self.bucket) * self.bucket

        pool = None
        futures = {}
        if self.prefetch_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.prefetch_workers)
            ahead = 2 * self.batch_size

            def image_for(i):
                # serve from the lookahead window; top it up as we go
                for j in range(i, min(i + ahead, len(requests))):
                    if j not in futures:
                        futures[j] = pool.submit(
                            self._load_image, requests[j]
                        )
                return futures.pop(i).result()

            for j in range(min(ahead, len(requests))):
                futures[j] = pool.submit(self._load_image, requests[j])
        else:

            def image_for(i):
                return self._load_image(requests[i])

        engine = ContinuousEngine(
            self.params,
            self.cfg,
            batch=self.batch_size,
            max_new_tokens=self.max_new_tokens,
            eos_id=self.eos_id,
            prompt_pad=pad,
            chunk=int(_os.environ.get("HALVA_CB_CHUNK", "16")),
            kv_quant=self.kv_quant,
            attn_impl=self.attn_impl,
        )
        reqs = [
            Request(
                ids=np.asarray(ids_all[i], np.int32),
                image=(lambda i=i: image_for(i)),
                budget=self.max_new_tokens,
            )
            for i in range(len(requests))
        ]
        try:
            out = engine.run(reqs)
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
        stop = get_template(self.template).stop_str()
        results = []
        for i, (toks, n) in enumerate(out):
            toks = toks.copy()
            toks[n:] = self.eos_id  # budget exits carry no eos marker
            text = decode_tokens(
                toks[None], np.asarray([n]), self.tok, self.eos_id,
                stop_strs=(stop,),
            )[0]
            results.append(text)
            if on_result:
                on_result(requests[i], text)
        wall = time.perf_counter() - t_all
        self.last_stats = {
            "continuous": True,
            "wall_s": round(wall, 3),
            **engine.stats,
        }
        return results

    def run(
        self,
        requests: Sequence[EvalRequest],
        on_result: Optional[Callable[[EvalRequest, str], None]] = None,
    ) -> List[str]:
        """Greedy-decode all requests; returns text per request (input
        order). Batches are filled in length-sorted order so each compiled
        (bucket, batch) program is reused maximally. With
        prefetch_workers > 0, per-batch host work (PIL decode + resize +
        normalize) runs in a lookahead thread (+ an image thread pool) so
        it overlaps device decode; stats land in self.last_stats."""
        import jax as _jax

        from halva_tpu.utils.prefetch import prefetch

        if self.continuous:
            return self._run_continuous(requests, on_result)

        # tokenization is cheap and the length sort needs every length
        # up front; image decode (the expensive part) stays per-batch
        ids_all = [self._tokenize(r) for r in requests]
        order = sorted(range(len(requests)), key=lambda i: len(ids_all[i]))
        results: List[Optional[str]] = [None] * len(requests)

        pool = None
        if self.prefetch_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.prefetch_workers)

        batches = [
            order[s : s + self.batch_size]
            for s in range(0, len(order), self.batch_size)
        ]
        it = (
            self._build_batch(requests, ids_all, idxs, pool)
            for idxs in batches
        )
        if self.prefetch_workers > 0:
            it = prefetch(it, depth=2)

        stop = get_template(self.template).stop_str()
        host_s = device_s = 0.0
        first_batch_s = None  # batch 0 = jit compile + prefill + decode
        spec_steps = spec_emitted = 0
        try:
            for bi, (idxs, batch_ids, imgs, lens, bh) in enumerate(it):
                host_s += bh
                t0 = time.perf_counter()
                if self.spec_k >= 2:
                    from halva_tpu.ops.speculative import (
                        generate_speculative,
                    )

                    tokens, num, sstats = generate_speculative(
                        self.params,
                        self.cfg,
                        jnp.asarray(batch_ids),
                        jnp.asarray(imgs),
                        jnp.asarray(lens),
                        max_new_tokens=self.max_new_tokens,
                        eos_id=self.eos_id,
                        draft_k=self.spec_k,
                        attn_impl=self.attn_impl,
                        kv_quant=self.kv_quant,
                    )
                    spec_steps += sstats["verify_steps"]
                    spec_emitted += sstats["emitted_tokens"]
                elif self.num_beams > 1:
                    from halva_tpu.ops.beam import generate_beam

                    tokens, num = generate_beam(
                        self.params,
                        self.cfg,
                        jnp.asarray(batch_ids),
                        jnp.asarray(imgs),
                        jnp.asarray(lens),
                        max_new_tokens=self.max_new_tokens,
                        eos_id=self.eos_id,
                        num_beams=self.num_beams,
                        length_penalty=self.length_penalty,
                        attn_impl=self.attn_impl,
                        kv_quant=self.kv_quant,
                        mesh=self.mesh,
                    )
                else:
                    tokens, num = generate(
                        self.params,
                        self.cfg,
                        jnp.asarray(batch_ids),
                        jnp.asarray(imgs),
                        jnp.asarray(lens),
                        max_new_tokens=self.max_new_tokens,
                        eos_id=self.eos_id,
                        attn_impl=self.attn_impl,
                        temperature=self.temperature,
                        top_p=self.top_p,
                        rng=_jax.random.PRNGKey(
                            self.seed + bi * self.batch_size
                        ),
                        kv_quant=self.kv_quant,
                        mesh=self.mesh,
                    )
                tokens = np.asarray(tokens)  # host readback = fence
                bdt = time.perf_counter() - t0
                device_s += bdt
                if first_batch_s is None:
                    first_batch_s = bdt
                    from halva_tpu.utils.phases import record

                    # startup attribution: batch 0 carries the jit
                    # compile (or compile-cache restore) + warmup
                    record("first_batch_generate", bdt)
                texts = decode_tokens(
                    tokens,
                    np.asarray(num),
                    self.tok,
                    self.eos_id,
                    stop_strs=(stop,),
                )
                for j, i in enumerate(idxs):
                    results[i] = texts[j]
                    if on_result:
                        on_result(requests[i], texts[j])
        finally:
            if pool is not None:
                pool.shutdown(wait=False)
        n = max(1, len(requests))
        self.last_stats = {
            "host_ms_per_img": round(host_s / n * 1e3, 2),
            "device_ms_per_img": round(device_s / n * 1e3, 2),
            "host_s": round(host_s, 3),
            "device_s": round(device_s, 3),
            "first_batch_s": round(first_batch_s or 0.0, 3),
            "overlapped": self.prefetch_workers > 0,
        }
        if self.spec_k >= 2:
            self.last_stats["spec_verify_steps"] = spec_steps
            self.last_stats["spec_emitted_tokens"] = spec_emitted
        return [r if r is not None else "" for r in results]


def write_answers_jsonl(
    path: str,
    requests: Sequence[EvalRequest],
    texts: Sequence[str],
    model_id: str,
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        for req, text in zip(requests, texts):
            row = {
                "question_id": req.question_id,
                "prompt": req.text,
                "text": text,
                "answer_id": uuid.uuid4().hex[:22],
                "model_id": model_id,
                "metadata": {},
            }
            row.update(req.extra)
            f.write(json.dumps(row) + "\n")
            f.flush()


# ---- request builders (the reference's loader scripts) -------------------


def vqa_requests(
    question_file: str,
    image_folder: str,
    num_chunks: int = 1,
    chunk_idx: int = 0,
    additional_input_prompt: str = "",
) -> List[EvalRequest]:
    """model_vqa_loader (POPE/MME/generic VQA question JSONL)."""
    questions = [json.loads(l) for l in open(question_file)]
    questions = split_chunk(questions, num_chunks, chunk_idx)
    return [
        EvalRequest(
            question_id=q["question_id"],
            text=q["text"] + additional_input_prompt,
            image_path=os.path.join(image_folder, q["image"]),
        )
        for q in questions
    ]


def chair_requests(
    image_folder: str, num_chunks: int = 1, chunk_idx: int = 0
) -> List[EvalRequest]:
    """model_chair_loader: fixed 500 COCO val2014 images, detail prompt."""
    images = split_chunk(chair500_image_list(), num_chunks, chunk_idx)
    return [
        EvalRequest(
            question_id=int(name.split("_")[-1].split(".")[0]),
            text=CHAIR_PROMPT,
            image_path=os.path.join(image_folder, name),
            extra={"image_id": int(name.split("_")[-1].split(".")[0])},
        )
        for name in images
    ]


def amber_requests(
    query_file: str, image_folder: str
) -> List[EvalRequest]:
    """model_amber_loader: AMBER query json (id/image/query)."""
    with open(query_file) as f:
        queries = json.load(f)
    return [
        EvalRequest(
            question_id=q["id"],
            text=q["query"],
            image_path=os.path.join(image_folder, q["image"]),
            extra={"id": q["id"]},
        )
        for q in queries
    ]


def mmhal_requests(
    data: Sequence[dict], image_folder: str
) -> List[EvalRequest]:
    """model_vqa_mmhal: MMHal-Bench records (96 questions). `data` is the
    loaded dataset rows (HF datasets dict or the response_template json);
    images must be pre-downloaded into image_folder keyed by the url
    basename (the reference also uses pre-downloaded images)."""
    reqs = []
    for i, row in enumerate(data):
        url = row.get("image_src") or row.get("image_path", "")
        fname = row.get("image_id") or os.path.basename(url)
        if not os.path.splitext(str(fname))[1]:
            fname = f"{fname}.jpg"
        reqs.append(
            EvalRequest(
                question_id=i,
                text=row["question"],
                image_path=os.path.join(image_folder, str(fname)),
                extra={
                    "question_type": row.get("question_type"),
                    "image_content": row.get("image_content"),
                    "gt_answer": row.get("gt_answer"),
                },
            )
        )
    return reqs


def hallusion_requests(
    data: Sequence[dict], image_folder: str
) -> List[EvalRequest]:
    """hallusion_bench/random_guess generate step: VD rows and VS rows
    with visual_input>0 carry an image; visual_input==0 is text-only."""
    reqs = []
    for i, row in enumerate(data):
        if int(row.get("visual_input", 0)) > 0:
            image_path = os.path.join(
                image_folder, row["filename"][2:]
            )
        else:
            image_path = None
        reqs.append(
            EvalRequest(
                question_id=i,
                text=row["question"],
                image_path=image_path,
                extra={
                    k: row.get(k)
                    for k in (
                        "category", "subcategory", "set_id",
                        "figure_id", "question_id", "visual_input",
                        "gt_answer", "gt_answer_details",
                    )
                },
            )
        )
    return reqs
