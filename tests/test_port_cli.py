"""End-to-end checkpoint-porting CLI test against FABRICATED reference
Lightning .ckpt files.

test_parity.py proves activation parity when porting a live torch
state_dict; this suite covers the remaining real-data onboarding path
(VERDICT round-1 task 10): a genuine Lightning checkpoint FILE with the
exact reference key layout (torch.save of the reference pl module's
state_dict under 'state_dict', as vis_motion_infiller.py:58 /
motion_traj_joint_model.py:44,65 consume) -> glamr_tpu.cli.port_checkpoint
-> the results/<cfg>/version_N/checkpoints tree -> models.load_joint_model
discovery — so the moment released reference weights land, the port runs
without new code (runbook: docs/real_data_runbook.md).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_HERE = os.path.dirname(os.path.abspath(__file__))
for _p in (_HERE, os.path.dirname(_HERE)):
    if _p not in sys.path:
        sys.path.insert(0, _p)
from refutil import ensure_ref  # noqa: E402

if not ensure_ref():
    pytest.skip("reference not available", allow_module_level=True)


class RefCfg:
    def __init__(self, yml_path):
        import yaml

        with open(yml_path) as f:
            self.yml_dict = yaml.safe_load(f)

    def __getattr__(self, k):
        d = self.__dict__.get("yml_dict", {})
        if k in d:
            return d[k]
        raise AttributeError(k)


def fabricate_lightning_ckpt(ref_module, path):
    """Write a Lightning-layout .ckpt exactly as pl.Trainer would:
    weights under 'state_dict' with the module's own key paths."""
    torch.save(
        {
            "epoch": 499,
            "global_step": 100000,
            "pytorch-lightning_version": "1.5.0",
            "state_dict": ref_module.state_dict(),
            "optimizer_states": [],
            "lr_schedulers": [],
        },
        path,
    )


@pytest.fixture(scope="module")
def results_tree(tmp_path_factory):
    """Fabricate both reference ckpts, port them via the CLI into a
    results/ tree, and chdir there so load_joint_model's relative
    results_root_dir discovery finds them."""
    from motion_infiller.models.motion_infiller_vae import (
        MotionInfillerVAE as RefMF,
    )
    from traj_pred.models.traj_pred_vae import TrajPredVAE as RefTP

    from glamr_tpu.cli.port_checkpoint import main as port_main

    root = tmp_path_factory.mktemp("real_data_onboarding")
    # reference TrajPredVAE loads data/J_regressor_extra.npy relative to CWD
    os.makedirs(root / "data", exist_ok=True)
    np.save(root / "data" / "J_regressor_extra.npy",
            np.zeros((9, 24), np.float32))
    old_cwd = os.getcwd()
    os.chdir(root)
    try:
        torch.manual_seed(7)
        mf_ref = RefMF(RefCfg(
            "/root/reference/motion_infiller/cfg/motion_infiller_demo.yml")).eval()
        tp_ref = RefTP(RefCfg(
            "/root/reference/traj_pred/cfg/traj_pred_demo.yml")).eval()

        mf_ckpt = str(root / "model-mf-epoch=499.ckpt")
        tp_ckpt = str(root / "model-tp-epoch=499.ckpt")
        fabricate_lightning_ckpt(mf_ref, mf_ckpt)
        fabricate_lightning_ckpt(tp_ref, tp_ckpt)

        port_main(["--model", "motion_infiller", "--ckpt", mf_ckpt])
        port_main(["--model", "traj_pred", "--ckpt", tp_ckpt])
        yield root, mf_ref, tp_ref
    finally:
        os.chdir(old_cwd)


class TestPortCLI:
    def test_ported_files_exist(self, results_tree):
        from glamr_tpu.utils import Config

        root, _, _ = results_tree
        for cfg_id in ["motion_infiller_demo", "traj_pred_demo"]:
            cfg = Config(cfg_id)
            p = (root / cfg.get("results_root_dir", "results") / cfg_id
                 / "version_0" / "checkpoints" / "best.pkl")
            assert p.exists(), p

    def test_load_joint_model_discovers_and_matches(self, results_tree):
        """load_joint_model must pick up the ported checkpoints (not the
        random init) and the loaded infiller must reproduce the torch
        module's activations through the whole file round trip."""
        import jax.numpy as jnp

        from glamr_tpu.body import get_smpl
        from glamr_tpu.models import MotionInfillerVAE, load_joint_model
        from glamr_tpu.utils import Config

        root, mf_ref, tp_ref = results_tree
        jm = load_joint_model(Config("joint_motion_traj_demo"),
                              smpl=get_smpl("body26fk", synthetic=True),
                              require_checkpoints=True)

        mcfg = jm.mfiller.cfg
        B, W = 2, mcfg.window_len
        rng = np.random.default_rng(3)
        frame_mask = np.ones((B, W), np.float32)
        frame_mask[:, 15:25] = 0.0
        in_pose = (rng.normal(0, 0.2, (B, W, 69)).astype(np.float32)
                   * frame_mask[..., None])
        eps = rng.normal(0, 1, (B, mcfg.nz)).astype(np.float32)

        with torch.no_grad():
            data = {
                "in_body_pose_tp": torch.from_numpy(in_pose.transpose(1, 0, 2)),
                "vis_frame_mask": torch.from_numpy(frame_mask == 0),
                "batch_size": B,
                "in_motion_latent": torch.from_numpy(eps),
            }
            mf_ref.context_encoder(data)
            mf_ref.data_decoder(data, mode="infer", sample_num=1)
            ref_out = data["infer_out_body_pose_tp"][:, :, 0, :].numpy()
            ref_out = ref_out.transpose(1, 0, 2)

        my_out = np.asarray(jm.mfiller.apply(
            jm.mfiller_params, jnp.asarray(in_pose), jnp.asarray(frame_mask),
            jnp.asarray(eps), method=MotionInfillerVAE.infer_step))
        err = np.abs(my_out - ref_out).max()
        assert err < 2e-4, f"round-tripped infiller mismatch: {err}"

    def test_require_checkpoints_raises_without_tree(self, tmp_path,
                                                     monkeypatch):
        from glamr_tpu.body import get_smpl
        from glamr_tpu.models import load_joint_model
        from glamr_tpu.utils import Config

        # defeat BOTH discovery fallbacks (repo-root results/ and the
        # committed checkpoints/ release artifacts) so the no-trained-
        # checkpoint path is actually exercised
        monkeypatch.setattr("glamr_tpu.utils.tools.resolve_results_dir",
                            lambda root: str(tmp_path / root))
        monkeypatch.setattr(
            "glamr_tpu.utils.checkpoint.released_checkpoint_path",
            lambda cfg_id: None)
        monkeypatch.chdir(tmp_path)
        with pytest.raises(FileNotFoundError):
            load_joint_model(Config("joint_motion_traj_demo"),
                             smpl=get_smpl("body26fk", synthetic=True),
                             require_checkpoints=True)


def test_export_params_release_roundtrip(tmp_path, monkeypatch):
    """glamr-export-params: trained results/ version -> committed
    params-only float16 artifact -> extract_params restores float32
    (cli/export_params.py; loaders fall back to checkpoints/<cfg>.params.pkl
    via utils/checkpoint.released_checkpoint_path)."""
    import pickle

    import numpy as np

    from glamr_tpu.cli.export_params import export_one
    from glamr_tpu.utils.checkpoint import extract_params

    params = {"dense": {"kernel": np.random.default_rng(0)
                        .standard_normal((4, 3)).astype(np.float32),
                        "bias": np.zeros(3, np.float32)},
              "steps": np.array(7, np.int32)}
    cp_dir = tmp_path / "results" / "traj_pred" / "traj_pred_demo" / \
        "version_0" / "checkpoints"
    cp_dir.mkdir(parents=True)
    with open(cp_dir / "best.pkl", "wb") as f:
        pickle.dump({"params": params, "opt_state": None}, f)

    monkeypatch.chdir(tmp_path)  # CWD-relative results/ wins
    out = export_one("traj_pred_demo", str(tmp_path / "checkpoints"))
    assert out and out.endswith("traj_pred_demo.params.pkl")

    with open(out, "rb") as f:
        art = pickle.load(f)
    assert art["format"] == "glamr_tpu.params.v1"
    assert art["params"]["dense"]["kernel"].dtype == np.float16
    assert art["params"]["steps"].dtype == np.int32  # ints untouched

    restored = extract_params(art)
    assert restored["dense"]["kernel"].dtype == np.float32
    np.testing.assert_allclose(restored["dense"]["kernel"],
                               params["dense"]["kernel"], atol=1e-3)
    # full TrainState-style dict still extracts exact params
    exact = extract_params({"params": params, "opt_state": None})
    np.testing.assert_array_equal(exact["dense"]["kernel"],
                                  params["dense"]["kernel"])
