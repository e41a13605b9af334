"""serve_cli end-to-end: smoke serve, engine checkpoint round-trip."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "serve_cli.py")]
        + args, capture_output=True, text=True, env=env, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.splitlines()
             if l.startswith("{")]
    return lines[:-1], lines[-1]


def test_serve_and_engine_checkpoint_roundtrip(tmp_path):
    ck = str(tmp_path / "eng")
    base = ["--model", "gpt2:small", "--prompt-ids", "12,51,8;4,9",
            "--max_new_tokens", "4", "--max_seq", "64", "--slots", "2"]
    comps1, stats1 = _run(base + ["--w_up", "77", "--a_up", "77",
                                  "--save_engine", ck])
    assert stats1["n_requests"] == 2 and stats1["new_tokens"] == 8
    assert os.path.exists(os.path.join(ck, "engine.json"))

    # the w4 stacks are stored at true 4-bit density (bitcodec pair
    # packing, exact): codes/2 (+ the 1-bit/element outlier sideband on
    # OVP sites) + per-layer value tables — 0.50-0.625x the int8 store
    meta = json.load(open(os.path.join(ck, "engine.json")))
    assert meta.get("w4_codec") == 1
    assert meta["w4_bytes_i8"] > 10 ** 7        # the real weight stacks
    assert meta["w4_bytes_packed"] < 0.66 * meta["w4_bytes_i8"], meta

    # restored engine generates the identical tokens, no recalibration
    comps2, stats2 = _run(base + ["--load_engine", ck])
    assert stats2["n_requests"] == 2
    t1 = {tuple(c["prompt"]): c["tokens"] for c in comps1}
    t2 = {tuple(c["prompt"]): c["tokens"] for c in comps2}
    assert t1 == t2
