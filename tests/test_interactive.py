"""Interactive HTML viewer export: capture fidelity + embedded-data
round-trip (reference capability: lib/utils/visualizer3d.py:75-240
interactive window; here a self-contained browser viewer)."""
import base64
import json
import re

import numpy as np

from glamr_tpu.body import get_smpl
from glamr_tpu.vis import SMPLVisualizer
from glamr_tpu.vis.interactive import capture_scene, export_html


def _make_vis():
    smpl = get_smpl("body26fk", synthetic=True)
    rng = np.random.default_rng(0)
    T = 6
    motion = {
        "orient": rng.normal(0, 0.05, (T, 3)).astype(np.float32),
        "body_pose": rng.normal(0, 0.05, (T, 69)).astype(np.float32),
        "betas": np.zeros((T, 10), np.float32),
        "trans": np.tile(np.array([0, 0, 0.9], np.float32), (T, 1)),
        "visible": np.array([1, 1, 0, 1, 1, 1], np.float32),
    }
    v = SMPLVisualizer(smpl=smpl, width=160, height=120, show_skeleton=True)
    v.set_motions([motion, motion])
    return v, T


def _extract_json(html, name):
    m = re.search(rf"const {name} = (.*?);\n", html, re.S)
    assert m, f"{name} not embedded"
    return json.loads(m.group(1))


class TestInteractiveExport:
    def test_capture_and_roundtrip(self, tmp_path):
        v, T = _make_vis()
        cap = capture_scene(v, T)
        assert cap["num_fr"] == T
        assert len(cap["slots"]) == 2            # two mesh actors
        # occlusion opacity captured per frame
        assert cap["slots"][0]["opacity"][2] < 1.0
        assert cap["slots"][0]["opacity"][0] == 1.0
        # skeleton line/point submissions present each frame
        assert all(len(fr) > 0 for fr in cap["lines"])
        assert all(len(fr) > 0 for fr in cap["points"])

        out = export_html(cap, str(tmp_path / "view.html"), fps=30)
        html = open(out).read()
        meta = _extract_json(html, "META")
        bufs = _extract_json(html, "BUFS")
        assert meta["num_fr"] == T and len(meta["meshes"]) == 2

        # dequantize the embedded vertex stream and compare to the capture
        m0 = meta["meshes"][0]
        q = np.frombuffer(base64.b64decode(bufs["mv0"]), np.uint16)
        q = q.reshape(T, m0["nv"], 3).astype(np.float64)
        deq = q * np.array(m0["scale"]) + np.array(m0["lo"])
        ref = np.stack(cap["slots"][0]["verts"])
        err = np.abs(deq - ref).max()
        assert err <= max(m0["scale"]) * 1.01, err    # half-step quantization

        faces = np.frombuffer(base64.b64decode(bufs["mf0"]), np.int32)
        np.testing.assert_array_equal(
            faces.reshape(-1, 3), cap["slots"][0]["faces"])

        # ragged line buffer offsets cover every frame
        off = np.frombuffer(base64.b64decode(bufs["line_off"]), np.int32)
        assert off.shape[0] == T + 1 and off[-1] > 0
        flat = np.frombuffer(base64.b64decode(bufs["lines"]), np.float32)
        assert flat.shape[0] == off[-1] * 3
        # one color row per ENDPOINT row — the JS draw loop indexes the
        # color buffer with endpoint offsets (lineCol[i*3], i += 2)
        lcol = np.frombuffer(base64.b64decode(bufs["line_col"]), np.uint8)
        assert lcol.shape[0] == flat.shape[0]
        pflat = np.frombuffer(base64.b64decode(bufs["points"]), np.float32)
        pcol = np.frombuffer(base64.b64decode(bufs["point_col"]), np.uint8)
        assert pcol.shape[0] == pflat.shape[0]

    def test_visualizer_method(self, tmp_path):
        v, T = _make_vis()
        out = v.save_interactive_html(str(tmp_path / "m.html"))
        html = open(out).read()
        # self-contained: no external script/style/font references
        assert "http://" not in html and "https://" not in html
        assert "<canvas" in html and "requestAnimationFrame" in html
