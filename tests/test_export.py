"""StableHLO export (stereoformer_tpu/export.py, cli/export.py): the
serving artifact reproduces the live model with no model code, and the
symbolic batch dimension serves any batch size from one file."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from stereoformer_tpu import export as sfx
from stereoformer_tpu.models import get_model


def test_export_roundtrip_batch_polymorphic(tmp_path):
    model = get_model("LowCNN")
    H, W = 32, 64
    left = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda l, r: model.init(jax.random.PRNGKey(0), l, r, iters=1,
                                train=False)
    )(left, left)

    exported = sfx.export_model(model, variables, H, W, iters=2)
    path = str(tmp_path / "m.shlo")
    nbytes = sfx.save_exported(exported, path)
    assert nbytes == os.path.getsize(path) > 0

    loaded = sfx.load_exported(path)
    assert "cpu" in [p.lower() for p in loaded.platforms]
    rng = np.random.RandomState(0)
    for B in (1, 3):
        l = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
        r = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
        got = sfx.infer_exported(loaded, l, r)
        want = jax.jit(
            lambda a, b: model.apply(variables, a, b, iters=2,
                                     train=False)["disparities"][-1]
        )(l, r)
        assert got.shape == (B, H, W, 1) == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3
        )


def test_export_cli_check(tmp_path, capsys):
    from stereoformer_tpu.cli.export import main

    out = str(tmp_path / "a.shlo")
    record = main([
        "--net", "LowCNN", "--height", "32", "--width", "64",
        "--iters", "1", "--out", out, "--check",
    ])
    assert os.path.exists(out)
    assert record["batch"] == "symbolic"
    assert record["check_max_err_px"] < 1e-2
    # the summary line is valid JSON on stdout
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["artifact"] == out


def test_export_cli_raft(tmp_path):
    """RAFT export regression: the registry must tolerate the shared
    loop/max_disp contract kwargs, and symbolic-batch export must not
    feed symbolic dims into the Pallas conv's grid/cost model."""
    from stereoformer_tpu.cli.export import main

    out = str(tmp_path / "raft.shlo")
    record = main([
        "--net", "RAFT_Stereo", "--height", "32", "--width", "64",
        "--iters", "1", "--out", out, "--check",
    ])
    assert os.path.exists(out)
    assert record["check_max_err_px"] < 1e-2
