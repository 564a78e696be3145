"""T5 prompt processing for the DeepFloyd path (VERDICT r2 #6).

Reference: threestudio/models/prompt_processors/deepfloyd_prompt_processor.py
(T5EncoderModel, attention-masked encode at max_length 77). Here:
a REAL tiny T5EncoderModel checkpoint + a hand-built unigram
tokenizer.json drive hf_t5_encode_fn end-to-end, the PromptProcessor
selects it via encoder_type, and the launcher wires a deep-floyd
guidance system (tiny IF arch + T5 embeddings) through build_system.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def make_t5_checkpoint(tmp, hidden=32):
    """Tiny real T5 encoder + a from-scratch fast tokenizer."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast, T5Config, T5EncoderModel

    enc_dir = os.path.join(tmp, "text_encoder")
    tok_dir = os.path.join(tmp, "tokenizer")
    os.makedirs(enc_dir, exist_ok=True)
    os.makedirs(tok_dir, exist_ok=True)

    cfg = T5Config(
        vocab_size=128,
        d_model=hidden,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
    )
    T5EncoderModel(cfg).save_pretrained(enc_dir)

    vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", 0.0)]
    for c in "abcdefghijklmnopqrstuvwxyz ":
        vocab.append((c, -1.0))
    while len(vocab) < 128:
        vocab.append((f"<x{len(vocab)}>", -10.0))
    tok = Tokenizer(models.Unigram(vocab, unk_id=2))
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement=" ")
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        pad_token="<pad>",
        eos_token="</s>",
        unk_token="<unk>",
        model_max_length=77,
    )
    fast.save_pretrained(tok_dir)
    return tmp


class TestT5Encode:
    def test_hf_t5_encode_fn(self, tmp_path):
        from humangaussian_tpu.guidance.prompt import hf_t5_encode_fn

        path = make_t5_checkpoint(str(tmp_path))
        encode = hf_t5_encode_fn(path)
        out = encode(["a man", "a woman in a dress", ""])
        assert out.shape == (3, 77, 32)
        assert np.isfinite(out).all()
        # different prompts encode differently; repeat calls are
        # deterministic
        assert not np.allclose(out[0], out[1])
        out2 = encode(["a man"])
        np.testing.assert_allclose(out2[0], out[0], atol=1e-6)

    def test_prompt_processor_selects_t5(self, tmp_path):
        from humangaussian_tpu.guidance.prompt import (
            PromptProcessor, PromptProcessorConfig)

        path = make_t5_checkpoint(str(tmp_path))
        proc = PromptProcessor(
            PromptProcessorConfig(
                prompt="a man", model_path=path, encoder_type="t5",
                use_cache=False,
            )
        )
        emb = proc()
        assert emb.text.shape == (77, 32)
        assert np.isfinite(np.asarray(emb.text_vd)).all()


class TestDeepFloydLaunch:
    def test_build_system_deep_floyd(self, tmp_path, monkeypatch):
        self._run(tmp_path, monkeypatch, use_perp_neg=False)

    def test_build_system_deep_floyd_perp_neg(self, tmp_path, monkeypatch):
        """system.guidance.use_perp_neg=true is reachable from the
        public config surface: the launcher hands the PromptEmbeddings
        to the system adapter, the system forwards per-camera
        elevation/azimuth, and the 4-way Perp-Neg CFG runs inside the
        jitted train step (reference prompt_processors/base.py:85-170)."""
        self._run(tmp_path, monkeypatch, use_perp_neg=True)

    def _run(self, tmp_path, monkeypatch, use_perp_neg):
        """system.guidance.type=deep-floyd builds a trainable system:
        tiny IF UNet, T5 default prompt encoder, pixel-space SDS step
        with finite loss. The torch->flax weight conversion boundary is
        stubbed (all shared UNet blocks have their own round-trip
        coverage in test_guidance/test_torch_parity)."""
        import sys

        sys.path.insert(0, os.path.dirname(__file__))
        from test_launch import make_smplx_npz

        import humangaussian_tpu.apps.launch as launch_mod
        import humangaussian_tpu.guidance.prompt as prompt_mod
        from humangaussian_tpu.guidance.deep_floyd import TINY_IF_CONFIG
        from humangaussian_tpu.guidance.unet import SingleUNet

        tmp = str(tmp_path)
        smplx_path = os.path.join(tmp, "SMPLX_NEUTRAL.npz")
        make_smplx_npz(smplx_path)
        model_dir = os.path.join(tmp, "if_model", "unet")
        os.makedirs(model_dir)
        with open(
            os.path.join(model_dir, "diffusion_pytorch_model.bin"), "wb"
        ) as f:
            f.write(b"stub")

        captured = {}

        def fake_load(path):
            captured["weights_path"] = path
            return {}

        def fake_convert(sd, num_levels=4, copy_last_n=1):
            unet = SingleUNet(TINY_IF_CONFIG)
            params = unet.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                jnp.zeros((1,)), jnp.zeros((1, 7, 32)),
            )
            captured["num_levels"] = num_levels
            return params, []

        # the T5 path needs a checkpoint dir; keep the launch test light
        # by stubbing the encoder fn (the real T5 encode is covered above)
        def fake_t5(model_path):
            captured["t5_model_path"] = model_path

            def encode(prompts):
                rng = np.random.RandomState(len("".join(prompts)))
                return rng.randn(len(prompts), 7, 32).astype(np.float32)

            return encode

        import humangaussian_tpu.guidance.convert as convert_mod

        monkeypatch.setattr(
            convert_mod, "load_torch_state_dict", fake_load
        )
        monkeypatch.setattr(
            convert_mod, "convert_unet_state_dict", fake_convert
        )
        monkeypatch.setattr(prompt_mod, "hf_t5_encode_fn", fake_t5)

        cfg = {
            "system": {
                "smplx_path": smplx_path,
                "capacity": 1024,
                "pts_num": 300,
                "pose_image_size": 64,
                "tile_capacity": 256,
                "prompt_processor": {
                    "prompt": "a man",
                    "use_cache": False,
                    "pretrained_model_name_or_path": "t5-dir",
                },
                "guidance": {
                    "type": "deep-floyd",
                    "arch": "tiny",
                    "model_key": os.path.join(tmp, "if_model"),
                    "guidance_scale": 20.0,
                    "use_perp_neg": use_perp_neg,
                },
            },
            "data": {"batch_size": 2, "height": 64, "width": 64},
        }
        system = launch_mod.build_system(cfg)
        assert captured["t5_model_path"] == "t5-dir"
        assert captured["weights_path"].endswith(
            "unet/diffusion_pytorch_model.bin"
        )
        assert captured["num_levels"] == 2

        if use_perp_neg:
            assert system.guidance.df.cfg.use_perp_neg
            assert system.guidance.embeddings is not None

        state = system.init_state(jax.random.PRNGKey(0))
        state, metrics = system.train_step(state)
        assert np.isfinite(float(metrics["loss"]))
