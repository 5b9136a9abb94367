"""Measured-table EM-kernel layout auto-selection (ops/kernel_select.py).

VERDICT r03 item 3: the default layout must be the MEASURED best per k
(table written by scripts/exp_kernel_v3.py on hardware), with
ENSTOP_EM_KERNEL demoted to an override.  Off-TPU (this suite) the table
must never apply — interpret-mode execution keeps the deterministic
alias-free routing in pallas_em.
"""

import json

import pytest

from enstop_tpu.ops import kernel_select
from enstop_tpu.ops.pallas_em import _resolve_variant


# what scripts/exp_kernel_v3.py records for device-bit-identical variants
PARITY_OK = {"jo": True, "jo_resident": True, "jo_res_bf16r": False}


@pytest.fixture
def table(tmp_path, monkeypatch):
    def write(entries, device_kind="TPU v5e", parity_ok=PARITY_OK):
        body = {"device_kind": device_kind, "entries": entries}
        if parity_ok is not None:
            body["parity_ok"] = parity_ok
        p = tmp_path / "kernel_measured.json"
        p.write_text(json.dumps(body))
        monkeypatch.setenv("ENSTOP_KERNEL_TABLE", str(p))
        kernel_select.clear_cache()
        return p

    yield write
    kernel_select.clear_cache()


ENTRIES = [
    {"k": 20, "best": "shipped",
     "per_iter_ms": {"shipped": 3.0, "jo": 3.1, "jo_resident": 3.05}},
    {"k": 100, "best": "jo_resident",
     "per_iter_ms": {"shipped": 12.0, "jo": 10.1, "jo_resident": 9.5}},
    {"k": 200, "best": "jo",
     "per_iter_ms": {"shipped": 30.0, "jo": 22.0, "jo_resident": 23.0}},
]


def test_measured_best_by_nearest_k(table):
    table(ENTRIES)
    f = kernel_select.measured_best_variant
    assert f(20, "TPU v5e") is None            # shipped won at k=20
    assert f(8, "TPU v5e") is None             # nearest is k=20
    assert f(100, "TPU v5e") == "jo_resident"
    assert f(64, "TPU v5e") == "jo_resident"   # log-nearest is 100 (not 20)
    assert f(200, "TPU v5e") == "jo"
    assert f(1000, "TPU v5e") == "jo"          # extrapolates to nearest


def test_win_margin_keeps_shipped_on_ties(table):
    table([{"k": 50, "best": "jo",
            "per_iter_ms": {"shipped": 10.0, "jo": 9.9}}])  # <2% win
    assert kernel_select.measured_best_variant(50, "TPU v5e") is None


def test_no_table_or_wrong_device_is_shipped(table):
    assert kernel_select.measured_best_variant(100, "TPU v5e") is None
    table(ENTRIES, device_kind="TPU v4")
    assert kernel_select.measured_best_variant(100, "TPU v5e") is None
    assert kernel_select.measured_best_variant(100, None) is None


def test_resolve_variant_off_tpu_ignores_table(table, monkeypatch):
    """This suite runs on CPU: even with a winning table the resolver must
    return None (interpret-mode keeps pallas_em's alias-free routing)."""
    table(ENTRIES)
    monkeypatch.delenv("ENSTOP_EM_KERNEL", raising=False)
    assert _resolve_variant(100) is None


def test_env_override_beats_table(table, monkeypatch):
    table(ENTRIES)
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "jo_res_bf16r")
    assert _resolve_variant(100) == "jo_res_bf16r"
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "shipped")
    assert _resolve_variant(100) is None
    monkeypatch.setenv("ENSTOP_EM_KERNEL", "bogus")
    with pytest.raises(ValueError):
        _resolve_variant(100)


def test_resident_variants_gated_by_n(table):
    """jo_resident holds the whole (n, kp) B in VMEM — at large n the
    selector must fall back to the next-best HBM-safe layout (jo here)
    instead of picking a program that cannot compile."""
    table([{"k": 200, "best": "jo_resident",
            "per_iter_ms": {"shipped": 30.0, "jo": 24.0,
                            "jo_resident": 22.0}}])
    f = kernel_select.measured_best_variant
    # small n: resident B fits -> measured best
    assert f(200, "TPU v5e", n=20_000) == "jo_resident"
    # 500k docs x kp=200 x 4B = 400 MB >> VMEM -> next-best HBM-safe layout
    assert f(200, "TPU v5e", n=500_000) == "jo"
    # n unknown (legacy callers): no gating, table best
    assert f(200, "TPU v5e") == "jo_resident"


def test_malformed_entries_degrade_to_shipped(table):
    """A stale or hand-edited table must never crash a fit: k<=0 (math.log
    domain), bool k, unknown variant names, and non-finite timings are all
    ignored rather than raised."""
    f = kernel_select.measured_best_variant
    table([{"k": 0, "best": "jo", "per_iter_ms": {"shipped": 1.0, "jo": 0.5}}])
    assert f(100, "TPU v5e") is None  # k=0 entry dropped, no entries left
    table([
        {"k": True, "per_iter_ms": {"shipped": 1.0, "jo": 0.5}},
        {"k": -3, "per_iter_ms": {"shipped": 1.0, "jo": 0.5}},
        {"k": 100, "per_iter_ms": {"shipped": 10.0, "jo_v2_renamed": 1.0,
                                   "jo": float("nan"), "jo_resident": -1.0}},
    ])
    # the k=100 entry survives but every variant timing is invalid/unknown
    assert f(100, "TPU v5e") is None
    table([{"k": 100, "per_iter_ms": {"shipped": 10.0, "jo": 8.0,
                                      "not_a_kernel": 1.0}}])
    assert f(100, "TPU v5e") == "jo"  # unknown name ignored, real win kept


def test_parity_gate_at_read_time(table):
    """ADVICE r04 (medium): the READER must re-enforce bit-identity — a
    stale, hand-edited, or ENSTOP_KERNEL_TABLE-supplied table must not be
    able to auto-select a non-bit-identical kernel."""
    f = kernel_select.measured_best_variant
    win = [{"k": 100, "best": "jo",
            "per_iter_ms": {"shipped": 10.0, "jo": 8.0}}]
    # table with no parity_ok record at all: nothing is admissible
    table(win, parity_ok=None)
    assert f(100, "TPU v5e") is None
    # parity_ok says jo failed parity: inadmissible despite the timing win
    table(win, parity_ok={"jo": False, "jo_resident": True})
    assert f(100, "TPU v5e") is None
    # non-boolean truthy parity values are not trusted
    table(win, parity_ok={"jo": "yes"})
    assert f(100, "TPU v5e") is None
    # honest table: the win applies
    table(win)
    assert f(100, "TPU v5e") == "jo"


def test_bf16r_never_auto_selected(table):
    """jo_res_bf16r is lossy and stays env-opt-in forever — even a table
    that (wrongly) claims parity for it must not get it auto-picked; the
    selector falls to the next-best allowlisted variant."""
    table([{"k": 100, "best": "jo_res_bf16r",
            "per_iter_ms": {"shipped": 10.0, "jo": 8.0,
                            "jo_res_bf16r": 5.0}}],
          parity_ok={"jo": True, "jo_resident": True, "jo_res_bf16r": True})
    assert kernel_select.measured_best_variant(100, "TPU v5e") == "jo"


def test_corrupt_table_is_shipped(tmp_path, monkeypatch):
    p = tmp_path / "bad.json"
    p.write_text("{not json")
    monkeypatch.setenv("ENSTOP_KERNEL_TABLE", str(p))
    kernel_select.clear_cache()
    try:
        assert kernel_select.measured_best_variant(100, "TPU v5e") is None
    finally:
        kernel_select.clear_cache()


def test_fused_dispatch_threads_n_into_selection(monkeypatch):
    """Wiring regression: em_accumulators_fused/refit_step_fused must pass
    the padded doc count into measured_best_variant — without it the VMEM
    residency gate silently stops protecting large-n fits."""
    import numpy as np

    from enstop_tpu.ops import pallas_em

    seen = []

    def recorder(k, kind, n=None):
        seen.append((k, kind, n))
        return None  # always shipped: downstream kernels run normally

    monkeypatch.setattr(pallas_em, "_interpret", lambda: False)
    monkeypatch.setattr(
        "enstop_tpu.ops.kernel_select.measured_best_variant", recorder)
    monkeypatch.setattr(
        pallas_em, "_fused_em_call",
        lambda X, zd, wz, w, bd, bw, **kw: (
            np.zeros((zd.shape[1], X.shape[1]), np.float32),
            np.zeros((X.shape[0], zd.shape[1]), np.float32),
            0.0,
        ))
    monkeypatch.setattr(
        pallas_em, "_fused_refit_call",
        lambda X, zd, wz, w, bd, bw, **kw: (
            np.zeros((X.shape[0], zd.shape[1]), np.float32), 0.0))

    X = np.zeros((16, 256), np.float32)
    zd = np.full((16, 8), 1 / 8, np.float32)
    wz = np.full((8, 256), 1 / 256, np.float32)
    pallas_em.em_accumulators_fused(X, zd, wz)
    pallas_em.refit_step_fused(X, zd, wz)
    assert len(seen) == 2
    for k, kind, n in seen:
        assert k == 8
        assert n == 16, "padded doc count must reach the VMEM gate"
