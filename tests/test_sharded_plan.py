"""Multi-chip sharding of the PRODUCTION plan path (VERDICT r2 item 3).

Runs CeltStreamPipeline(use_plan=True, mesh=8 virtual CPU devices) on real
committed CELT packets (tests/fixtures/golden.npz) and checks the sharded
PCM matches the unsharded plan pipeline exactly. This is the same code
path bench.py measures, sharded over the stream axis with shard_map
(parallel/streaming.sharded_plan_step)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _fixture_payloads(name="celt_fb_stereo_128k"):
    from mousiki_tpu.bitstream.packet import parse_packet
    z = np.load("tests/fixtures/golden.npz")
    blob = z[name + "__packets"].tobytes()
    lens = z[name + "__lens"]
    pkts, pos = [], 0
    for ln in lens:
        pkts.append(blob[pos:pos + int(ln)])
        pos += int(ln)
    return [parse_packet(p).frames[0] for p in pkts]


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_plan_pipeline_matches_unsharded():
    from mousiki_tpu.celt import host_native
    if not host_native.available():
        pytest.skip("native celt host unavailable")
    from mousiki_tpu.parallel.streaming import make_mesh
    from mousiki_tpu.pipeline import CeltStreamPipeline

    payloads = _fixture_payloads()
    n_dev = len(jax.devices())
    S = 2 * n_dev
    mesh = make_mesh()
    pipe_s = CeltStreamPipeline(S, channels=2, use_plan=True, mesh=mesh)
    pipe_r = CeltStreamPipeline(S, channels=2, use_plan=True)
    for i in range(6):
        pl = [payloads[(i + s) % len(payloads)] for s in range(S)]
        got = np.asarray(pipe_s.step(pl, 960))
        want = np.asarray(pipe_r.step(pl, 960))
        assert got.shape == (S, 960, 2)
        np.testing.assert_allclose(got, want, atol=1e-6, rtol=0)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_plan_pipeline_plc_matches_unsharded():
    """Lossy traffic under the mesh: the sharded step must run the SAME
    device PLC as the single-chip path (VERDICT r4 item 5 — previously
    the sharded step dropped the lost8 plane and emitted unconcealed
    output)."""
    from mousiki_tpu.celt import host_native
    if not host_native.available():
        pytest.skip("native celt host unavailable")
    from mousiki_tpu.parallel.streaming import make_mesh
    from mousiki_tpu.pipeline import CeltStreamPipeline

    payloads = _fixture_payloads()
    n_dev = len(jax.devices())
    S = 2 * n_dev
    mesh = make_mesh()
    pipe_s = CeltStreamPipeline(S, channels=2, use_plan=True, mesh=mesh)
    pipe_r = CeltStreamPipeline(S, channels=2, use_plan=True)
    rng = np.random.default_rng(5)
    saw_loss = False
    for i in range(8):
        pl = [payloads[(i + s) % len(payloads)] for s in range(S)]
        if i >= 2:  # warm histories first so PLC has a signal to extend
            for s in range(S):
                if rng.random() < 0.3:
                    pl[s] = None
                    saw_loss = True
        got = np.asarray(pipe_s.step(pl, 960))
        want = np.asarray(pipe_r.step(pl, 960))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    assert saw_loss
