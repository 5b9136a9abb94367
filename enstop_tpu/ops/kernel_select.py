"""Measured-best EM-kernel grid-layout selection (VERDICT r03 item 3).

The round-3 traffic analysis (ops/pallas_em_variants.py docstring) predicts
the j-outer layouts beat the shipped i-outer kernel at large k (the aliased-A
RMW + wz re-read traffic scales with kp), but a prediction must not pick the
default — only hardware numbers may.  scripts/exp_kernel_v3.py, when it runs
on a live relay, writes its sweep into ``enstop_tpu/data/kernel_measured.json``;
this module reads that table and picks the measured-best variant for a given
k.  No table / no measured win -> the shipped kernel (current behavior,
bit-for-bit).

Selection contract:

* ``ENSTOP_EM_KERNEL`` (explicit variant or ``shipped``/``default``) always
  wins — the env switch is demoted to an override, per the verdict.
* the table only applies on a REAL tpu backend of the same device kind it
  was measured on (interpret-mode runs must keep the deterministic
  alias-free routing in pallas_em).
* k is matched to the nearest measured k in log-space; a variant is chosen
  only if it beat the shipped kernel by >2% there (ties keep shipped).

Table schema (written by scripts/exp_kernel_v3.py)::

    {"device_kind": "TPU v5e", "date": "...",
     "parity_ok": {"jo": true, "jo_resident": true, "jo_res_bf16r": false},
     "entries": [
        {"k": 100, "best": "jo_resident",
         "per_iter_ms": {"shipped": 12.1, "jo": 10.0, "jo_resident": 9.6}},
        ...]}
"""

from __future__ import annotations

import functools
import json
import math
import os
from pathlib import Path

TABLE_PATH = Path(__file__).resolve().parent.parent / "data" / "kernel_measured.json"

# a measured variant must beat shipped by this factor to displace it
_WIN_MARGIN = 0.98


@functools.lru_cache(maxsize=1)
def _load_table():
    path = os.environ.get("ENSTOP_KERNEL_TABLE", str(TABLE_PATH))
    try:
        with open(path) as fh:
            t = json.load(fh)
        if not isinstance(t.get("entries"), list):
            return None
        return t
    except (OSError, ValueError):
        return None


def clear_cache():
    _load_table.cache_clear()


# jo_resident / jo_res_bf16r hold the whole (n, kp) B accumulator in VMEM;
# only auto-select them when it fits comfortably under the kernel's VMEM
# budget (96 MB) alongside the tile buffers.  "jo" keeps B in HBM (aliased
# RMW) and works at any n.
_RESIDENT_B_BUDGET_BYTES = 64 * 1024 * 1024
_RESIDENT_VARIANTS = ("jo_resident", "jo_res_bf16r")

# Read-time defense in depth (ADVICE r04): only variants on this allowlist
# may EVER be auto-selected, regardless of table content.  jo_res_bf16r is
# deliberately absent — its bf16 responsibilities are lossy, so it stays
# ENSTOP_EM_KERNEL-opt-in forever even if a stale or hand-edited table
# claims parity for it.
_AUTO_ELIGIBLE = frozenset({"jo", "jo_resident"})


def _known_variants():
    from .pallas_em_variants import VARIANTS

    return set(VARIANTS)


def _valid_k(v):
    return (isinstance(v, (int, float)) and not isinstance(v, bool)
            and v > 0 and math.isfinite(v))


def measured_best_variant(k: int, device_kind: str | None,
                          n: int | None = None) -> str | None:
    """The measured-best grid layout for ``k`` on this device, or ``None``
    for the shipped kernel.  ``device_kind`` is ``jax.devices()[0].device_kind``
    of a real tpu backend (pass ``None`` off-TPU -> always shipped).
    ``n`` (padded doc count) gates the VMEM-resident layouts, whose B
    accumulator is ``(n, kp)`` resident — at large n they fall back to the
    next-best HBM-safe layout.

    Degrades to ``None`` (shipped) on ANY malformed table content — a stale
    or hand-edited table must never crash a fit."""
    if device_kind is None:
        return None
    table = _load_table()
    if table is None:
        return None
    measured_kind = table.get("device_kind", "")
    if measured_kind and measured_kind != device_kind:
        return None  # measured on different hardware: don't extrapolate
    # writer-side parity filter is re-checked here: a non-shipped variant is
    # admissible only if it is on the bit-identical allowlist AND the table
    # itself recorded parity_ok[name] is True (missing/False -> inadmissible)
    parity_ok = table.get("parity_ok")
    parity_ok = parity_ok if isinstance(parity_ok, dict) else {}
    known = {
        name for name in (_known_variants() & _AUTO_ELIGIBLE)
        if parity_ok.get(name) is True
    } | {"shipped"}
    entries = [e for e in table["entries"]
               if isinstance(e, dict) and _valid_k(e.get("k"))
               and isinstance(e.get("per_iter_ms"), dict)]
    if not entries:
        return None
    nearest = min(entries, key=lambda e: abs(math.log(e["k"]) - math.log(max(k, 1))))
    times = {
        name: v for name, v in nearest["per_iter_ms"].items()
        if name in known and isinstance(v, (int, float))
        and not isinstance(v, bool) and v > 0 and math.isfinite(v)
    }
    shipped = times.get("shipped")
    if shipped is None:
        return None
    kp = -(-max(int(k), 1) // 8) * 8
    if n is not None:
        for name in _RESIDENT_VARIANTS:
            if name in times and int(n) * kp * 4 > _RESIDENT_B_BUDGET_BYTES:
                del times[name]  # resident B would not fit VMEM at this n
    best_name = min(times, key=times.get)
    if best_name == "shipped" or times[best_name] > shipped * _WIN_MARGIN:
        return None
    return best_name
