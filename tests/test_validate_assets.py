"""scripts/validate_assets.py: the real-asset first-contact kit
(VERDICT r2 #9) — passes on schema-correct synthetic fixtures, fails
with actionable messages on the classic mistakes (wrong model family,
plain SD UNet instead of the joint model, SD1.x text encoder)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import validate_assets as va  # noqa: E402


def make_real_shaped_smplx(path, v=10475, j=55):
    np.savez(
        path,
        v_template=np.zeros((v, 3), np.float32),
        shapedirs=np.zeros((v, 3, 400), np.float32),
        posedirs=np.zeros((v, 3, (j - 1) * 9), np.float32),
        J_regressor=np.zeros((j, v), np.float32),
        kintree_table=np.zeros((2, j), np.int64),
        weights=np.zeros((v, j), np.float32),
        f=np.zeros((20908, 3), np.int32),
        hands_meanl=np.zeros(45, np.float32),
        hands_meanr=np.zeros(45, np.float32),
    )


def make_joint_model(root):
    torch = pytest.importorskip("torch")
    unet = os.path.join(root, "unet_ema")
    os.makedirs(unet)
    sd = {
        "conv_in.weight": torch.zeros(320, 8, 3, 3),
        "conv_out.weight": torch.zeros(4, 320, 3, 3),
        "add_embedding.linear_1.weight": torch.zeros(1280, 1536),
        "conv_in_branch.0.weight": torch.zeros(320, 8, 3, 3),
    }
    torch.save(sd, os.path.join(unet, "diffusion_pytorch_model.bin"))
    with open(os.path.join(unet, "config.json"), "w") as f:
        json.dump(
            {"in_channels": 8, "cross_attention_dim": 1024,
             "addition_embed_type": "time"},
            f,
        )


class TestSMPLX:
    def test_passes_on_release_schema(self, tmp_path):
        p = str(tmp_path / "SMPLX_NEUTRAL.npz")
        make_real_shaped_smplx(p)
        rep = va.Report()
        va.validate_smplx(p, rep)
        assert rep.errors == []
        assert rep.checks > 5

    def test_flags_wrong_model_family(self, tmp_path):
        p = str(tmp_path / "SMPL_NEUTRAL.npz")  # SMPL: 6890 verts, 24 joints
        make_real_shaped_smplx(p, v=6890, j=24)
        rep = va.Report()
        va.validate_smplx(p, rep)
        assert any("10475" in e for e in rep.errors)
        assert any("kintree" in e for e in rep.errors)

    def test_flags_missing_fields(self, tmp_path):
        p = str(tmp_path / "weird.npz")
        np.savez(p, v_template=np.zeros((10475, 3), np.float32))
        rep = va.Report()
        va.validate_smplx(p, rep)
        assert any("missing npz field" in e for e in rep.errors)


class TestJointModel:
    def test_passes_on_joint_layout(self, tmp_path):
        make_joint_model(str(tmp_path))
        rep = va.Report()
        va.validate_joint_model(str(tmp_path), rep)
        assert rep.errors == []

    def test_flags_plain_sd_unet(self, tmp_path):
        torch = pytest.importorskip("torch")
        unet = tmp_path / "unet_ema"
        unet.mkdir()
        sd = {
            "conv_in.weight": torch.zeros(320, 4, 3, 3),  # 4ch: plain SD
            "conv_out.weight": torch.zeros(4, 320, 3, 3),
        }
        torch.save(sd, str(unet / "diffusion_pytorch_model.bin"))
        rep = va.Report()
        va.validate_joint_model(str(tmp_path), rep)
        assert any("PLAIN SD UNet" in e for e in rep.errors)
        assert any("8, 3, 3" in e or "expected (320, 8" in e
                   for e in rep.errors)


class TestTextEncoders:
    def _mk(self, root, arch, hidden=1024):
        enc = os.path.join(root, "text_encoder")
        tok = os.path.join(root, "tokenizer")
        os.makedirs(enc)
        os.makedirs(tok)
        with open(os.path.join(enc, "config.json"), "w") as f:
            json.dump({"architectures": [arch], "hidden_size": hidden}, f)
        open(os.path.join(tok, "tokenizer.json"), "w").write("{}")

    def test_clip_ok_and_sd1_flagged(self, tmp_path):
        ok_dir = str(tmp_path / "sd2")
        self._mk(ok_dir, "CLIPTextModel", 1024)
        rep = va.Report()
        va.validate_text_encoder(ok_dir, rep, "clip")
        assert rep.errors == []

        sd1 = str(tmp_path / "sd1")
        self._mk(sd1, "CLIPTextModel", 768)
        rep = va.Report()
        va.validate_text_encoder(sd1, rep, "clip")
        assert any("SD1.x" in e for e in rep.errors)

    def test_t5(self, tmp_path):
        d = str(tmp_path / "if")
        self._mk(d, "T5EncoderModel", 4096)
        rep = va.Report()
        va.validate_text_encoder(d, rep, "t5")
        assert rep.errors == []


class TestCLI:
    def test_cli_end_to_end(self, tmp_path, capsys):
        p = str(tmp_path / "SMPLX_NEUTRAL.npz")
        make_real_shaped_smplx(p)
        make_joint_model(str(tmp_path))
        rc = va.main(["--smplx", p, "--model-key", str(tmp_path)])
        assert rc == 0
        out = capsys.readouterr().out
        assert "checks passed" in out

    def test_cli_reports_failures(self, tmp_path, capsys):
        p = str(tmp_path / "SMPLX_NEUTRAL.npz")
        make_real_shaped_smplx(p, v=6890, j=24)
        rc = va.main(["--smplx", p])
        assert rc == 1
        out = capsys.readouterr().out
        assert "FAIL" in out and "10475" in out
