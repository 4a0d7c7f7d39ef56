"""Scaling-harness tests on the virtual CPU mesh.

The harness (``parallel/scaling.py``) is the exact code a pod run will use
(``bench.py`` ``BENCH_MESH=dpxtp`` and ``dryrun_multichip`` both route
through it); these tests pin its contract — mesh construction, sharded
packed execution, weak-scaling arithmetic, and the collective census parsed
from compiled HLO — so a real multi-chip measurement needs zero new code.
"""
import jax
import numpy as np
import pytest

from quantize_tpu.parallel import collective_stats, measure_scaling

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 (virtual) devices")


@needs_devices
def test_measure_scaling_dp_tp():
    r = measure_scaling(model_name="resnet18", w_bits=8, per_device_batch=2,
                        dp=2, tp=2, image_size=32, num_classes=16, iters=2)
    assert r["n_devices"] == 4 and r["mesh"] == {"data": 2, "model": 2}
    assert r["global_batch"] == 4
    assert r["t1_ms"] > 0 and r["tn_ms"] > 0
    assert np.isfinite(r["weak_scaling_efficiency"])
    assert r["img_per_s_per_chip_ndev"] > 0
    # tensor parallelism over 'model' must insert at least one collective
    assert sum(r["collective_counts"].values()) > 0
    assert r["collective_bytes_per_step"] > 0
    assert r["est_ici_ms"] >= 0


@needs_devices
def test_measure_scaling_pure_dp_has_no_collectives():
    """Pure data-parallel inference is embarrassingly parallel — the
    forward graph must compile with NO cross-device collectives."""
    r = measure_scaling(model_name="resnet18", w_bits=8, per_device_batch=2,
                        dp=4, tp=1, image_size=32, num_classes=16, iters=2)
    assert sum(r["collective_counts"].values()) == 0
    assert r["collective_bytes_per_step"] == 0


def test_collective_stats_parses_hlo():
    hlo = """
  %ar = f32[8,16]{1,0} all-reduce(f32[8,16]{1,0} %p0), replica_groups={}
  %ag = bf16[4,32]{1,0} all-gather(bf16[4,8]{1,0} %p1), dimensions={1}
  %rs = s8[128]{0} reduce-scatter(s8[1024]{0} %p2), dimensions={0}
    """
    s = collective_stats(hlo)
    assert s["collective_counts"] == {"all-reduce": 1, "all-gather": 1,
                                      "reduce-scatter": 1}
    assert s["collective_bytes_per_step"] == 8 * 16 * 4 + 4 * 32 * 2 + 128


def test_collective_stats_counts_async_pairs_once():
    """Real-TPU optimized HLO emits async <op>-start/<op>-done pairs; each
    collective must count exactly once (the -start), not twice."""
    hlo = """
  %s0 = f32[8,16]{1,0} all-reduce-start(f32[8,16]{1,0} %p0), replica_groups={}
  %d0 = f32[8,16]{1,0} all-reduce-done(f32[8,16]{1,0} %s0)
  %s1 = bf16[4,32]{1,0} all-gather-start(bf16[4,8]{1,0} %p1), dimensions={1}
  %d1 = bf16[4,32]{1,0} all-gather-done(bf16[4,32]{1,0} %s1)
    """
    s = collective_stats(hlo)
    assert s["collective_counts"] == {"all-reduce": 1, "all-gather": 1}
    assert s["collective_bytes_per_step"] == 8 * 16 * 4 + 4 * 32 * 2


def test_collective_stats_tuple_shaped_starts():
    """TPU all-reduce-start returns a tuple — (operand alias, result) for
    one operand, concatenated halves for multi-operand variants. The alias
    duplication must count once; distinct tuple elements must ALL count
    (the round-4 parser took only the first element, understating
    traffic); unknown dtypes are surfaced, not silently priced at 4B."""
    hlo = """
  %s0 = (f32[8,16]{1,0}, f32[8,16]{1,0}) all-reduce-start(f32[8,16]{1,0} %p0), replica_groups={}
  %d0 = f32[8,16]{1,0} all-reduce-done(%s0)
  %s1 = (bf16[4,8]{1,0}, u32[2]{0}, bf16[4,32]{1,0}, u32[2]{0}) all-gather-start(bf16[4,8]{1,0} %p1), dimensions={1}
  %d1 = bf16[4,32]{1,0} all-gather-done(%s1)
    """
    s = collective_stats(hlo)
    assert s["collective_counts"] == {"all-reduce": 1, "all-gather": 1}
    # ar: aliased pair counts once; ag: no duplicated halves -> all 4 count
    expected = 8 * 16 * 4 + (4 * 8 * 2 + 2 * 4 + 4 * 32 * 2 + 2 * 4)
    assert s["collective_bytes_per_step"] == expected
    assert "unknown_dtypes" not in s

    s2 = collective_stats("%x = e5m2[16]{0} all-reduce(e5m2[16]{0} %p)")
    assert s2["unknown_dtypes"] == ["e5m2"]
    assert s2["collective_bytes_per_step"] == 16 * 4


@needs_devices
def test_measure_scaling_census_by_mesh_shape():
    """The census must separate TP collectives from DP leakage: tp-heavy
    meshes insert all-gathers for the out-channel-sharded packed weights,
    while the dp-only row (test above) compiles to zero. More model
    parallelism must not shrink the collective count."""
    r_tp = measure_scaling(model_name="resnet18", w_bits=8,
                           per_device_batch=2, dp=1, tp=4, image_size=32,
                           num_classes=16, iters=2)
    assert sum(r_tp["collective_counts"].values()) > 0
    r_mix = measure_scaling(model_name="resnet18", w_bits=8,
                            per_device_batch=2, dp=2, tp=2, image_size=32,
                            num_classes=16, iters=2)
    assert (sum(r_tp["collective_counts"].values())
            >= sum(r_mix["collective_counts"].values()))


@pytest.mark.slow
def test_multiprocess_scaling_row(tmp_path):
    """The scaling harness across a REAL process boundary (the DCN-ish
    rehearsal): 2 spawned workers x 4 virtual devices run the identical
    measure_scaling over a global (2x4) mesh; process 0's row must carry a
    finite efficiency and the same TP collective census the single-process
    mesh produces."""
    from quantize_tpu.parallel import run_multiprocess_scaling

    # default port=None picks a free ephemeral coordinator port per run
    r = run_multiprocess_scaling(n_processes=2, devices_per_process=4,
                                 dp=2, tp=4)
    assert r["n_processes"] == 2 and r["n_devices"] == 8
    assert np.isfinite(r["weak_scaling_efficiency"])
    assert r["weak_scaling_efficiency"] > 0
    assert sum(r["collective_counts"].values()) > 0  # TP all-gathers
    assert r["collective_bytes_per_step"] > 0
