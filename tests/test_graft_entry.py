"""Guard the driver contract file.

The driver compiles __graft_entry__.entry() single-chip and runs
dryrun_multichip(N) on a virtual CPU mesh.  Round 4 shipped a qsel
signature change (inter.py rdo_pick 2->4 values) without re-running the
dryrun, so the one file the driver executes was the one file nothing
tested.  These tests run the real entry() and dryrun stages 1-3 on the
8-device CPU mesh every suite run.
"""
import numpy as np


def _load():
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    import jax
    mod = _load()
    fn, args = mod.entry()
    outs = jax.jit(fn)(*args)
    jax.block_until_ready(outs)


def test_dryrun_multichip_stages_1_to_3():
    """The sharded fused inter step (stage 1: the exact signature the
    flagship encoder uses, rdo_pick 4-tuple qsel), tile sharding with
    halo exchange (stage 2), and GOP shard/merge (stage 3) — the same
    code the driver runs, minus the slow multi-process + HD/4K shapes."""
    mod = _load()
    mod.dryrun_multichip(4, stages=(1, 2, 3))
