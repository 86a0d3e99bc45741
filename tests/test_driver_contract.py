"""Driver-contract checks: bench.py emits one JSON line; __graft_entry__
exposes entry() and dryrun_multichip()."""

import json
import sys

import jax
import jax.numpy as jnp


def test_bench_json_contract(monkeypatch, capsys):
    sys.path.insert(0, "/root/repo")
    import bench
    monkeypatch.setattr(bench, "measure",
                        lambda fused: 2000.0 if fused else 1000.0)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "mfu"}
    assert rec["vs_baseline"] == 2.0


def test_graft_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 64, 1024)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dryrun_multichip_cpu():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        import pytest
        pytest.skip("needs 4 virtual CPU devices")
    ge.dryrun_multichip(4)
