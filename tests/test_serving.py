"""Serving boundary tests: serialization roundtrip + secret-free server sort.

Parity with the reference's SortContext deserialization path (sort.h:31-102)
and the FHERMA golden vector (src/testcase.json; copied as a data fixture
with attribution in tests/fixtures/).
"""

import json
import os

import numpy as np
import pytest

from fhe_sorting_tpu.core.context import CkksParams, Context
from fhe_sorting_tpu.core.evaluator import Evaluator
from fhe_sorting_tpu.core.facade import DebugEncryption, Encryption, print_pt
from fhe_sorting_tpu.core.keys import Keys
from fhe_sorting_tpu.core.serialize import (
    load_ciphertext, load_context, load_eval_keys, save_ciphertext,
    save_context, save_eval_keys,
)
from fhe_sorting_tpu.models.direct_sort import (
    DirectSort, rotation_indices_direct_sort,
)
from fhe_sorting_tpu.ops.sign import CompositeSignConfig, SignConfig, SignFunc

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_serialize_roundtrip(tmp_path):
    ctx = Context(CkksParams(ring_n=256, mult_depth=6))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys([1, 2])

    save_context(str(tmp_path / "cc.json"), ctx)
    ctx2 = load_context(str(tmp_path / "cc.json"))
    assert ctx2.q_primes == ctx.q_primes

    save_eval_keys(str(tmp_path / "keys.npz"), keys)
    keys2 = load_eval_keys(str(tmp_path / "keys.npz"), ctx2)
    assert keys2.s_eval is None  # the server never holds a secret
    assert set(keys2.rot) == set(keys.rot)

    x = np.arange(8) / 8.0
    ct = keys.encrypt(x)
    save_ciphertext(str(tmp_path / "ct.npz"), ct)
    ct2 = load_ciphertext(str(tmp_path / "ct.npz"))
    np.testing.assert_array_equal(np.asarray(ct2.data), np.asarray(ct.data))
    assert (ct2.level, ct2.sdeg, ct2.slots) == (ct.level, ct.sdeg, ct.slots)

    # server-side evaluation with deserialized keys decrypts correctly
    ev = Evaluator(ctx2, keys2)
    out = ev.add(ev.rotate(ct2, 1), 0.5)
    got = keys.decrypt(out)  # client decrypts
    np.testing.assert_allclose(got, np.roll(x, -1) + 0.5, atol=5e-5)


def test_facade(capsys):
    ctx = Context(CkksParams(ring_n=256, mult_depth=4))
    keys = Keys.generate(ctx, seed=1)
    enc = Encryption(keys)
    dbg = DebugEncryption(keys)
    x = np.array([0.1, 0.2, 0.3, 0.4])
    ct = enc.encrypt_input(x)
    got = dbg.get_decrypt(ct, 4)
    np.testing.assert_allclose(got, x, atol=5e-5)
    print_pt(enc, ct)  # no-op: not decrypt-capable
    assert capsys.readouterr().out == ""
    print_pt(dbg, ct, 4)
    assert "level" in capsys.readouterr().out


def _golden_target(fixture):
    """Expected sorted vector for the FHERMA fixture, preferring `output`.

    The upstream golden `output` (reference src/testcase.json) is internally
    inconsistent with its own `input`: 121 entries for a 128-element input,
    and the value multisets disagree (e.g. 13 surplus 245.67 entries).  When
    (if) upstream ships a self-consistent output we compare against it
    directly; until then the plaintext sort of `input` is the only
    well-defined contract, and test_fherma_fixture_consistency pins the
    known inconsistency so a fixed fixture flips us to the golden path.
    """
    x = np.asarray(fixture["input"], dtype=np.float64)
    golden = np.asarray(fixture["output"], dtype=np.float64)
    expected = np.sort(x)
    if len(golden) == len(x) and np.allclose(np.sort(golden), expected):
        return golden
    return expected


def test_fherma_fixture_consistency():
    """Document the upstream fixture's output/input mismatch (see above)."""
    with open(os.path.join(FIXTURES, "fherma_testcase.json")) as f:
        fixture = json.load(f)
    golden = np.asarray(fixture["output"], dtype=np.float64)
    assert np.all(np.diff(golden) >= 0), "golden output must be sorted"
    target = _golden_target(fixture)
    if len(golden) == len(fixture["input"]):
        np.testing.assert_allclose(target, golden)  # upstream fixed it
    else:
        assert len(golden) == 121  # known-inconsistent upstream snapshot


@pytest.mark.slow
def test_fherma_golden_vector():
    """N=128 FHERMA input sorted under encryption (insecure fast ring)."""
    with open(os.path.join(FIXTURES, "fherma_testcase.json")) as f:
        fixture = json.load(f)
    x = np.asarray(fixture["input"], dtype=np.float64) / 255.0
    target = _golden_target(fixture) / 255.0

    ring, depth, N = 8192, 34, 128
    ctx = Context(CkksParams(ring_n=ring, mult_depth=depth))
    keys = Keys.generate(ctx, seed=0)
    steps = rotation_indices_direct_sort(N, ring) | {1 << i for i in range(12)}
    keys.gen_rotation_keys(sorted(steps))
    ev = Evaluator(ctx, keys)
    srt = DirectSort(ev, N)
    cfg = SignConfig(CompositeSignConfig(4, 3, 3))
    out = keys.decrypt(srt.sort(keys.encrypt(x), SignFunc.CompositeSign, cfg), N)
    assert np.abs(out - target).max() < 0.01


def test_server_cli_end_to_end(tmp_path):
    """Full serving loop through the CLI on FILES (main.cpp parity): client
    builds context + eval keys + encrypted input, server (no secret key)
    sorts via serving.sort_server.main, client decrypts the output file."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from serving.sort_server import main as server_main
    from fhe_sorting_tpu.utils.depth_meter import measure_direct_sort_depth

    N, RING = 8, 512
    scfg = SignConfig(CompositeSignConfig(3, 2, 2))
    depth = measure_direct_sort_depth(N, RING, scfg)["mult_depth"]
    ctx = Context(CkksParams(ring_n=RING, mult_depth=depth))
    keys = Keys.generate(ctx, seed=0)
    keys.gen_rotation_keys(sorted(rotation_indices_direct_sort(N, RING)))

    save_context(str(tmp_path / "cc.json"), ctx)
    save_eval_keys(str(tmp_path / "keys.npz"), keys)
    rng = np.random.default_rng(13)
    x = rng.permutation(N) / N + 0.5 / N
    save_ciphertext(str(tmp_path / "in.npz"), keys.encrypt(x))

    server_main([
        "--cc", str(tmp_path / "cc.json"),
        "--keys", str(tmp_path / "keys.npz"),
        "--input", str(tmp_path / "in.npz"),
        "--output", str(tmp_path / "out.npz"),
        "--n", str(N), "--algo", "direct",
        "--sign_n", "3", "--dg", "2", "--df", "2",
    ])

    out = load_ciphertext(str(tmp_path / "out.npz"))
    got = keys.decrypt(out, N)   # client-side decrypt
    assert np.abs(got - np.sort(x)).max() < 0.01
