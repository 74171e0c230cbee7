"""Native (C++) plan-mode symbol decode vs the Python recorder + packer.

The native host's celt_host_decode_plan must emit byte-identical packed
plan tensors to pack_plans(record_plan=True) for the same packet stream,
plus the same frame descriptor fields as the direct native decode. Then
the device executor must reconstruct the same spectrum from the native
plan (reference semantics: src/celt/bands.rs quant_all_bands:2575).
"""

import numpy as np
import pytest

from mousiki_tpu.bitstream.packet import parse_packet
from mousiki_tpu.celt import host_native
from mousiki_tpu.celt.decoder import CeltDecoder
from mousiki_tpu.celt.plan_pack import pack_plans
from mousiki_tpu.testing import oracle

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(not oracle.available(), reason="libopus oracle missing"),
    pytest.mark.skipif(not host_native.available(), reason="native lib missing"),
]


def _make_payloads(channels, bitrate, n, signal="tone"):
    enc = oracle.RefEncoder(48000, channels, oracle.APP_RESTRICTED_LOWDELAY)
    enc.ctl_set(oracle.SET_BITRATE, bitrate)
    if signal == "tone":
        sig = oracle.make_test_signal(960 * n, channels, seed=3)
    else:
        rng = np.random.default_rng(11)
        sig = np.zeros((960 * n, channels), np.float32)
        for i in range(0, 960 * n, 480):
            sig[i:i + 24] = rng.standard_normal(
                (24, channels)).astype(np.float32) * 0.9
    pcm16 = oracle.float_to_i16(sig)
    return [parse_packet(enc.encode(
        pcm16[f * 960:(f + 1) * 960].reshape(-1), 960)).frames[0]
        for f in range(n)]


def _mask_inactive(key, arr, bufs):
    """Zero value fields at inactive slots so stale buffer contents don't
    fail the comparison (the executor only reads flagged slots)."""
    if key.startswith("pvq_") and key != "pvq_active":
        return [np.where(a, v, 0) for a, v in zip(bufs["pvq_active"], arr)]
    gate = {
        "call_lb_src": "call_has_lb", "call_lb_buf": "call_has_lb",
        "call_blend_upto": "call_has_lb",
        "call_pre": "call_active", "call_post": "call_active",
        "call_norm_buf": "call_norm_write",
        "fill_fold": "fill_active", "fill_off": "fill_active",
        "fill_n": "fill_active", "fill_gain": "fill_active",
        "fill_seed": "fill_active",
        "merge_mid": "merge_active", "merge_inv": "merge_active",
        "theta2_cswap": "theta2_active", "theta2_sign": "theta2_active",
        "theta2_mid": "theta2_active", "theta2_side": "theta2_active",
        "theta2_inv": "theta2_active",
        "n1_val": "n1_active",
        "ac_masks": "ac_on", "ac_r": "ac_on", "ac_seed": "ac_on",
    }.get(key)
    if gate is None:
        return arr
    g = bufs[gate].astype(bool)
    while g.ndim < arr.ndim:
        g = g[..., None] if g.shape != arr.shape[:g.ndim] else g[..., None]
    if key in ("ac_masks", "ac_r", "ac_seed"):
        g = bufs["ac_on"].astype(bool).reshape(
            (-1,) + (1,) * (arr.ndim - 1))
    return np.where(np.broadcast_to(g, arr.shape), arr, 0)


KEYS = ["direct", "pvq_active", "pvq_n", "pvq_k", "pvq_b", "pvq_spread",
        "pvq_gain", "pvq_idx", "pvq_dst", "call_active", "call_has_lb",
        "call_lb_src", "call_lb_buf", "call_blend_upto", "call_pre",
        "call_post", "call_norm_write", "call_norm_buf", "fill_active",
        "fill_fold", "fill_off", "fill_n", "fill_gain", "fill_seed",
        "merge_active", "merge_mid", "merge_inv", "theta2_active",
        "theta2_cswap", "theta2_sign", "theta2_mid", "theta2_side",
        "theta2_inv", "n1_active", "n1_val", "ac_on", "ac_masks", "ac_r",
        "ac_seed"]


@pytest.mark.parametrize("channels,bitrate,signal", [
    (2, 128000, "tone"),
    (1, 64000, "tone"),
    (2, 48000, "tone"),     # folding/noise leaves
    (2, 510000, "tone"),    # max rate: deepest splits
    (2, 96000, "clicks"),   # transients: B>1 walks, anti-collapse
    (1, 32000, "clicks"),
])
def test_native_plan_matches_python_pack(channels, bitrate, signal):
    n = 12
    payloads = _make_payloads(channels, bitrate, n, signal)

    # Python side: per-frame record + pack (fresh decoder = fresh state)
    dec = CeltDecoder(channels=channels, stream_channels=channels)
    plans, descs = [], []
    for p in payloads:
        d = dec.decode_with_ec(p, 960, return_desc=True, record_plan=True)
        plans.append(d["plan"])
        descs.append(d)

    batch = host_native.NativeCeltHostBatch(1, channels=channels)
    for f, payload in enumerate(payloads):
        bufs = batch.decode_plan([payload], 960)
        assert int(bufs["rcs"][0]) == 0, f"frame {f} rc={bufs['rcs'][0]}"
        want = pack_plans([plans[f]], channels, 960)
        assert not bool(want["direct"][0]), f"frame {f} python plan direct"
        assert not bool(bufs["direct"][0]), f"frame {f} native fell back"
        for key in KEYS:
            got = bufs[key]
            exp = want[key]
            if isinstance(exp, list):
                got = _mask_inactive(key, [np.asarray(g) for g in got], bufs)
                exp = _mask_inactive(key, [np.asarray(e) for e in exp], want)
                for t in range(3):
                    np.testing.assert_array_equal(
                        np.asarray(got[t]), np.asarray(exp[t]),
                        err_msg=f"frame {f} {key}[tier {t}]")
            else:
                got = _mask_inactive(key, np.asarray(got), bufs)
                exp = _mask_inactive(key, np.asarray(exp), want)
                np.testing.assert_array_equal(
                    got, exp, err_msg=f"frame {f} key {key}")
        # frame descriptor fields vs the Python decoder
        d = descs[f]
        np.testing.assert_allclose(bufs["band_log_e"][0, :channels],
                                   d["band_log_e"][:channels], atol=1e-12,
                                   err_msg=f"frame {f} band_log_e")
        assert bool(bufs["iflags"][0, 0]) == bool(d["transient"])
        assert bool(bufs["iflags"][0, 1]) == bool(d["silence"])
        assert int(bufs["iflags"][0, 2]) == int(d["pf_pitch"])
        assert int(bufs["iflags"][0, 3]) == int(d["pf_tapset"])
        assert abs(float(bufs["pf_gain"][0]) - float(d["pf_gain"])) < 1e-12


def test_native_plan_executes_to_reference_spectrum():
    """Native plan -> device executor == direct f64 decoder spectrum."""
    import jax.numpy as jnp
    from mousiki_tpu.ops.band_exec_jax import execute_packed

    channels, n = 2, 8
    payloads = _make_payloads(channels, 96000, n, "clicks")
    dec = CeltDecoder(channels=channels, stream_channels=channels)
    refs = [np.asarray(dec.decode_with_ec(p, 960, return_desc=True)["x"])
            [:channels] for p in payloads]

    batch = host_native.NativeCeltHostBatch(1, channels=channels)
    for f, payload in enumerate(payloads):
        bufs = batch.decode_plan([payload], 960)
        pd = {}
        for key in KEYS:
            v = bufs[key]
            pd[key] = ([jnp.asarray(a) for a in v] if isinstance(v, list)
                       else jnp.asarray(v))
        X = np.asarray(execute_packed(
            pd, jnp.asarray(bufs["x_direct"]), channels=channels, frame=960,
            lm=3, start=0, end=21))
        np.testing.assert_allclose(X[0].reshape(channels, 960), refs[f],
                                   atol=2e-5, err_msg=f"frame {f}")


def test_native_plan_fallback_on_garbage():
    """Random payloads must either plan-decode or fall back cleanly; the
    stream state must stay usable afterwards."""
    rng = np.random.default_rng(5)
    batch = host_native.NativeCeltHostBatch(1, channels=2)
    good = _make_payloads(2, 128000, 1)[0]
    for _ in range(50):
        blob = bytes(rng.integers(0, 256, rng.integers(2, 60)).astype(np.uint8))
        bufs = batch.decode_plan([blob], 960)
        assert bufs["rcs"][0] in (0, -2, -3)
    bufs = batch.decode_plan([good], 960)
    assert bufs["rcs"][0] == 0
