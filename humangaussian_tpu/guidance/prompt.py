"""Prompt processing: view-dependent CLIP text embeddings with disk cache.

Re-designs /root/reference/threestudio/models/prompt_processors/base.py +
texture_structure_prompt_processor.py for the TPU stack:

- four DirectionConfigs (side / front / back / overhead) selected per
  camera by azimuth/elevation thresholds (base.py:231-299; defaults 45/
  45/60 deg, :189-193); later directions override earlier ones, so
  "side" is the catch-all;
- embeddings are computed ONCE on the host by a frozen CLIP text encoder
  (the reference spawns a subprocess + md5-keyed disk cache,
  :344-394; we run the HF encoder in-process on CPU and cache npz);
- `get_text_embeddings` returns the 3-segment [cond | neg | null]
  batch layout the ANPG guidance expects (base.py:78-83 — note the
  comment there: this order is specific to this pipeline);
- "lib:" prompts resolve through a JSON prompt library with magic-word
  scoring (base.py:423-442).

The direction SELECTION is pure jnp (jit-safe inside the train step);
encoding itself is host-side setup, like the reference.
"""
from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Callable, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


def shift_azimuth_deg(azimuth):
    """Map azimuth degrees into (-180, 180] (base.py misc)."""
    return (azimuth + 180.0) % 360.0 - 180.0


@dataclasses.dataclass(frozen=True)
class DirectionConfig:
    name: str
    prompt: Callable[[str], str]
    negative_prompt: Callable[[str], str]


def directions(front_style: bool = False) -> Sequence[DirectionConfig]:
    """The four view-dependent prompt decorations (base.py:231-299)."""
    if front_style:  # "side view of {s}"
        fmt = lambda d: (lambda s, d=d: f"{d} view of {s}")
    else:  # "{s}, side view"
        fmt = lambda d: (lambda s, d=d: f"{s}, {d} view")
    return (
        DirectionConfig("side", fmt("side"), lambda s: s),
        DirectionConfig("front", fmt("front"), lambda s: s),
        DirectionConfig(
            "back", fmt("backside" if front_style else "back"), lambda s: s
        ),
        DirectionConfig("overhead", fmt("overhead"), lambda s: s),
    )


def direction_index(
    elevation,
    azimuth,
    overhead_threshold: float = 60.0,
    front_threshold: float = 45.0,
    back_threshold: float = 45.0,
):
    """[B] direction ids (0 side, 1 front, 2 back, 3 overhead); later
    conditions override earlier, as in base.py:53-66."""
    az = shift_azimuth_deg(azimuth)
    idx = jnp.zeros(jnp.shape(elevation), jnp.int32)  # side = everywhere
    idx = jnp.where((az > -front_threshold) & (az < front_threshold), 1, idx)
    idx = jnp.where(
        (az > 180.0 - back_threshold) | (az < -180.0 + back_threshold), 2, idx
    )
    idx = jnp.where(elevation > overhead_threshold, 3, idx)
    return idx


class PromptEmbeddings(NamedTuple):
    """Precomputed embeddings; all [*, L, D] float32 jnp arrays."""

    text_vd: jnp.ndarray  # [4,L,D] view-dependent cond
    uncond_vd: jnp.ndarray  # [4,L,D] view-dependent negative
    text: jnp.ndarray  # [L,D] plain cond
    uncond: jnp.ndarray  # [L,D] plain negative
    null: jnp.ndarray  # [L,D] empty prompt

    def get_text_embeddings(
        self, elevation, azimuth, camera_distances=None,
        view_dependent_prompting: bool = True, **thresholds
    ):
        """[3B,L,D] in [cond | neg | null] order (base.py:78-83)."""
        b = jnp.shape(elevation)[0]
        if view_dependent_prompting:
            idx = direction_index(elevation, azimuth, **thresholds)
            cond = self.text_vd[idx]
            neg = self.uncond_vd[idx]
        else:
            cond = jnp.broadcast_to(self.text, (b,) + self.text.shape)
            neg = jnp.broadcast_to(self.uncond, (b,) + self.uncond.shape)
        null = jnp.broadcast_to(self.null, (b,) + self.null.shape)
        return jnp.concatenate([cond, neg, null], axis=0)


def shifted_exponential_decay(a, b, c, r):
    """a*exp(-b*r)+c (threestudio/utils/ops.py:423-424)."""
    return a * jnp.exp(-b * r) + c


def perpendicular_component(x, y):
    """Component of x perpendicular to y, batched over axis 0
    (threestudio/utils/ops.py:431-438)."""
    axes = tuple(range(1, x.ndim))
    dot = jnp.sum(x * y, axis=axes, keepdims=True)
    nrm = jnp.sum(y * y, axis=axes, keepdims=True)
    return x - dot / jnp.maximum(nrm, 1e-6) * y


# default Perp-Neg decay coefficients (prompt_processors/base.py Config)
PERP_NEG_F_SB = (1.0, 0.5, -0.606)
PERP_NEG_F_FSB = (1.0, 0.5, 0.967)
PERP_NEG_F_FS = (4.0, 0.5, -2.426)
PERP_NEG_F_SF = (4.0, 0.5, -2.426)


def get_text_embeddings_perp_neg(
    emb: "PromptEmbeddings",
    elevation,
    azimuth,
    camera_distances=None,
    f_sb=PERP_NEG_F_SB,
    f_fsb=PERP_NEG_F_FSB,
    f_fs=PERP_NEG_F_FS,
    f_sf=PERP_NEG_F_SF,
    **thresholds,
):
    """Perp-Neg embeddings (base.py:85-170): positive prompt interpolated
    between front/side/back by azimuth; two negative-direction prompts per
    camera with signed guidance weights. Returns ([4B, L, D] embeddings in
    [pos | uncond | neg1,neg2 interleaved] order, weights [B, 2])."""
    az = shift_azimuth_deg(azimuth)
    idx = direction_index(elevation, azimuth, **thresholds)
    side, front, back, overhead = (
        emb.text_vd[0], emb.text_vd[1], emb.text_vd[2], emb.text_vd[3]
    )
    uncond = emb.uncond_vd[idx]  # [B, L, D]

    abs_az = jnp.abs(az)
    is_over = (idx == 3)[:, None, None]
    is_fs = (abs_az < 90.0)[:, None, None]
    r_fs = 1.0 - jnp.abs(az) / 90.0  # 1=front, 0=side
    r_sb = 2.0 - jnp.abs(az) / 90.0  # 1=side, 0=back

    pos_fs = r_fs[:, None, None] * front + (1 - r_fs)[:, None, None] * side
    pos_sb = r_sb[:, None, None] * side + (1 - r_sb)[:, None, None] * back
    pos = jnp.where(is_over, overhead, jnp.where(is_fs, pos_fs, pos_sb))

    b = az.shape[0]
    bfront = jnp.broadcast_to(front, (b,) + front.shape)
    bside = jnp.broadcast_to(side, (b,) + side.shape)
    neg1 = jnp.where(is_over, uncond, jnp.where(is_fs, bfront, bside))
    neg2 = jnp.where(is_over, uncond, jnp.where(is_fs, bside, bfront))

    w1 = jnp.where(
        idx == 3, 0.0,
        jnp.where(
            abs_az < 90.0,
            -shifted_exponential_decay(*f_fs, r_fs),
            -shifted_exponential_decay(*f_sb, r_sb),
        ),
    )
    w2 = jnp.where(
        idx == 3, 0.0,
        jnp.where(
            abs_az < 90.0,
            -shifted_exponential_decay(*f_sf, 1.0 - r_fs),
            -shifted_exponential_decay(*f_fsb, r_sb),
        ),
    )
    # negatives interleaved per camera, as the reference lists them
    negs = jnp.stack([neg1, neg2], axis=1).reshape((2 * b,) + neg1.shape[1:])
    out = jnp.concatenate([pos, uncond, negs], axis=0)
    return out, jnp.stack([w1, w2], axis=1)


@dataclasses.dataclass
class PromptProcessorConfig:
    prompt: str = ""
    negative_prompt: str = ""
    model_path: str = ""  # local HF dir with tokenizer/ + text_encoder/
    overhead_threshold: float = 60.0
    front_threshold: float = 45.0
    back_threshold: float = 45.0
    view_dependent_prompt_front: bool = False
    use_prompt_debiasing: bool = False
    prompt_debiasing_model_path: str = "bert-base-uncased"
    prompt_debiasing_mask_ids: tuple | None = None
    cache_dir: str = ".humangaussian_cache/text_embeddings"
    prompt_library_path: str = ""  # JSON for "lib:" prompts
    use_cache: bool = True
    encoder_type: str = "clip"  # "clip" (SD2) | "t5" (DeepFloyd IF) —
    #   reference ships one prompt-processor subclass per encoder
    #   (texture_structure/stable_diffusion vs deepfloyd_prompt_processor)


def _hash_prompt(model: str, prompt: str) -> str:
    return hashlib.md5(f"{model}-{prompt}".encode()).hexdigest()


def resolve_library_prompt(prompt: str, library_path: str) -> str:
    """'lib:keyword1_keyword2' -> best-matching library prompt
    (base.py:423-442: candidates containing ALL keywords; error on 0)."""
    if not prompt.startswith("lib:"):
        return prompt
    with open(library_path) as f:
        library = json.load(f)
    keywords = prompt[4:].lower().split("_")
    candidates = [
        p
        for group in library.values()
        for p in group
        if all(k in p.lower() for k in keywords)
    ]
    if not candidates:
        raise ValueError(f"no library prompt matches {prompt!r}")
    return candidates[0]


def get_debiased_prompts(
    prompt: str,
    view_names: list[str],
    model_path: str,
    mask_ids: list[int] | None = None,
) -> list[str]:
    """BERT-masked-LM prompt debiasing (prompt_processors/base.py:449-507):
    for each word, compare the view-word distribution p([MASK] view of
    <prompt>) with and without that word; words whose pointwise mutual
    information with a view falls below 0.95 are dropped from that
    view's prompt. Host-side torch, like the CLIP encoder."""
    import torch
    import torch.nn.functional as F
    from transformers import AutoTokenizer, BertForMaskedLM

    os.environ["TOKENIZERS_PARALLELISM"] = "false"
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    model = BertForMaskedLM.from_pretrained(model_path)
    model.eval()

    view_ids = tokenizer(" ".join(view_names), return_tensors="pt").input_ids[0]
    view_ids = view_ids[1 : 1 + len(view_names)]

    @torch.no_grad()
    def modulate(p: str) -> torch.Tensor:
        prompt_vd = f"This image is depicting a [MASK] view of {p}"
        tokens = tokenizer(
            prompt_vd, padding="max_length", truncation=True,
            add_special_tokens=True, return_tensors="pt",
        )
        mask_idx = torch.where(
            tokens.input_ids == tokenizer.mask_token_id
        )[1]
        logits = model(**tokens).logits
        probs = F.softmax(logits[0, mask_idx], dim=-1)[0, view_ids]
        return probs / probs.sum()

    words = prompt.split(" ")
    prompts = [list(words) for _ in view_names]
    full_probe = modulate(prompt)
    ids = mask_ids if mask_ids is not None else list(range(len(words)))
    for idx in ids:
        partial = " ".join(words[:idx] + words[idx + 1 :])
        part_probe = modulate(partial)
        pmi = full_probe / torch.lerp(part_probe, full_probe, 0.5)
        for i in range(pmi.shape[0]):
            if pmi[i].item() < 0.95:
                prompts[i][idx] = ""
    return [" ".join(w for w in p if w) for p in prompts]


def hf_t5_encode_fn(model_path: str) -> Callable[[list[str]], np.ndarray]:
    """Host-side T5 text encoder from a local HF checkpoint — the
    DeepFloyd IF prompt pipeline (reference
    deepfloyd_prompt_processor.py: T5EncoderModel + attention-masked
    encode at max_length 77). Same layout convention as the CLIP
    encoder: `tokenizer/` + `text_encoder/` subfolders or a flat dir."""

    def encode(prompts: list[str]) -> np.ndarray:
        import torch
        from transformers import AutoTokenizer, T5EncoderModel

        tok_path = os.path.join(model_path, "tokenizer")
        enc_path = os.path.join(model_path, "text_encoder")
        tokenizer = AutoTokenizer.from_pretrained(
            tok_path if os.path.isdir(tok_path) else model_path
        )
        encoder = T5EncoderModel.from_pretrained(
            enc_path if os.path.isdir(enc_path) else model_path
        )
        encoder.eval()
        max_len = min(int(tokenizer.model_max_length), 77)
        with torch.no_grad():
            tokens = tokenizer(
                prompts,
                padding="max_length",
                max_length=max_len,
                truncation=True,
                add_special_tokens=True,
                return_tensors="pt",
            )
            out = encoder(
                tokens.input_ids, attention_mask=tokens.attention_mask
            )[0]
        return out.float().numpy()

    return encode


def hf_clip_encode_fn(model_path: str) -> Callable[[list[str]], np.ndarray]:
    """Build a host-side CLIP text encoder from a local HF checkpoint
    (tokenizer + CLIPTextModel, torch CPU) — the in-process analogue of
    the reference's spawn_func (texture_structure_prompt_processor.py:85-116)."""

    def encode(prompts: list[str]) -> np.ndarray:
        import torch
        from transformers import AutoTokenizer, CLIPTextModel

        tok_path = os.path.join(model_path, "tokenizer")
        enc_path = os.path.join(model_path, "text_encoder")
        tokenizer = AutoTokenizer.from_pretrained(
            tok_path if os.path.isdir(tok_path) else model_path
        )
        encoder = CLIPTextModel.from_pretrained(
            enc_path if os.path.isdir(enc_path) else model_path
        )
        encoder.eval()
        # tokenizer.model_max_length defaults to a sentinel ~1e30 when
        # the checkpoint ships no tokenizer_config (it then overflows
        # transformers' enable_truncation); the text model's own
        # position-embedding count is the real limit either way
        max_len = min(
            int(tokenizer.model_max_length),
            int(encoder.config.max_position_embeddings),
        )
        with torch.no_grad():
            tokens = tokenizer(
                prompts,
                padding="max_length",
                max_length=max_len,
                truncation=True,
                return_tensors="pt",
            )
            out = encoder(tokens.input_ids)[0]
        return out.float().numpy()

    return encode


class PromptProcessor:
    """Host-side precompute; produces a jit-friendly PromptEmbeddings."""

    def __init__(
        self,
        cfg: PromptProcessorConfig,
        encode_fn: Callable[[list[str]], np.ndarray] | None = None,
    ):
        self.cfg = cfg
        if encode_fn is None:
            builder = {"clip": hf_clip_encode_fn, "t5": hf_t5_encode_fn}[
                cfg.encoder_type
            ]
            encode_fn = builder(cfg.model_path)
        self.encode_fn = encode_fn
        prompt = cfg.prompt
        if prompt.startswith("lib:"):
            prompt = resolve_library_prompt(prompt, cfg.prompt_library_path)
        self.prompt = prompt
        self.negative_prompt = cfg.negative_prompt
        self.directions = directions(cfg.view_dependent_prompt_front)

    def _encode_cached(self, prompts: list[str]) -> np.ndarray:
        cfg = self.cfg
        if not cfg.use_cache:
            return self.encode_fn(prompts)
        os.makedirs(cfg.cache_dir, exist_ok=True)
        out: list[np.ndarray | None] = []
        missing: list[tuple[int, str]] = []
        for i, p in enumerate(prompts):
            path = os.path.join(
                cfg.cache_dir, _hash_prompt(cfg.model_path, p) + ".npy"
            )
            if os.path.exists(path):
                out.append(np.load(path))
            else:
                out.append(None)
                missing.append((i, p))
        if missing:
            fresh = self.encode_fn([p for _, p in missing])
            for (i, p), emb in zip(missing, fresh):
                path = os.path.join(
                    cfg.cache_dir, _hash_prompt(cfg.model_path, p) + ".npy"
                )
                np.save(path, emb)
                out[i] = emb
        return np.stack(out)  # type: ignore[arg-type]

    def __call__(self) -> PromptEmbeddings:
        if self.cfg.use_prompt_debiasing:
            debiased = get_debiased_prompts(
                self.prompt,
                [d.name for d in self.directions],
                self.cfg.prompt_debiasing_model_path,
                list(self.cfg.prompt_debiasing_mask_ids)
                if self.cfg.prompt_debiasing_mask_ids is not None else None,
            )
            vd_prompts = [
                d.prompt(p) for d, p in zip(self.directions, debiased)
            ]
        else:
            vd_prompts = [d.prompt(self.prompt) for d in self.directions]
        vd_neg = [d.negative_prompt(self.negative_prompt) for d in self.directions]
        all_prompts = (
            [self.prompt, self.negative_prompt, ""] + vd_prompts + vd_neg
        )
        emb = self._encode_cached(all_prompts)
        n = len(self.directions)
        return PromptEmbeddings(
            text=jnp.asarray(emb[0]),
            uncond=jnp.asarray(emb[1]),
            null=jnp.asarray(emb[2]),
            text_vd=jnp.asarray(emb[3 : 3 + n]),
            uncond_vd=jnp.asarray(emb[3 + n : 3 + 2 * n]),
        )


def dummy_encode_fn(
    seq_len: int = 77, dim: int = 1024
) -> Callable[[list[str]], np.ndarray]:
    """Deterministic pseudo-embeddings keyed by prompt hash — the
    analogue of the reference's dummy-prompt-processor
    (prompt_processors/dummy_prompt_processor.py), for pipelines and
    tests that need the PromptEmbeddings plumbing without a CLIP
    checkpoint."""

    def encode(prompts: list[str]) -> np.ndarray:
        out = []
        for p in prompts:
            seed = int(_hash_prompt("dummy", p)[:8], 16)
            rs = np.random.RandomState(seed)
            out.append(rs.normal(0, 1, (seq_len, dim)).astype(np.float32))
        return np.stack(out)

    return encode


class DummyPromptProcessor(PromptProcessor):
    """PromptProcessor with the dummy encoder pre-wired."""

    def __init__(self, cfg: PromptProcessorConfig, encode_fn=None):
        super().__init__(cfg, encode_fn or dummy_encode_fn())
