"""Summarize the TPU queue's per-step logs into a markdown snippet.

Run after scripts/tpu_round5_queue.sh completes (or partially completes):
    python scripts/summarize_queue_results.py [/tmp]
Parses the JSON/result lines each step prints and emits a
PERFORMANCE.md-ready summary, so a relay window late in the round can be
integrated in minutes.  Tolerant of missing/partial logs; reads the newest
queue generation's log for each step (tpu_q5_* preferred over tpu_q4_*).
"""

import ast
import json
import re
import sys
from pathlib import Path


def read(path):
    try:
        return Path(path).read_text(errors="replace")
    except OSError:
        return ""


def read_step(base, name):
    for prefix in ("tpu_q5_", "tpu_q4_"):
        text = read(Path(base) / f"{prefix}{name}.log")
        if text:
            if prefix == "tpu_q4_":
                # never silently report a prior generation's numbers as
                # the current round's results
                print(f"WARNING: {name}: using STALE {prefix}{name}.log "
                      "(no tpu_q5_ log found)", file=sys.stderr)
                text = f"[STALE {prefix} log]\n" + text
            return text
    return ""


def last_json_line(text):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                try:
                    # python dict repr; literal_eval cannot execute code
                    return ast.literal_eval(line)
                except Exception:
                    continue
    return None


def main():
    base = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp")
    out = []

    for name, label in [
        ("bench", "bench (shipped kernel)"),
        ("bench_aot_warm", "bench (AOT-warm / table-selected kernel)"),
        ("bench_jores", "bench (ENSTOP_EM_KERNEL=jo_resident)"),
    ]:
        rec = last_json_line(read_step(base, name))
        if rec and isinstance(rec, dict) and "value" in rec:
            out.append(
                f"* **{label}**: {rec['value']} Gupd/s, "
                f"vs_baseline {rec.get('vs_baseline')}, backend "
                f"{rec.get('backend')}, mfu {rec.get('mfu_bf16_v5e')}, "
                f"kernel {rec.get('em_kernel', 'n/a')}"
            )
        else:
            out.append(f"* {label}: no record")

    kv3 = read_step(base, "kernel_v3")
    rec = last_json_line(kv3)
    if isinstance(rec, dict) and "per_iter_ms" in rec:
        out.append("* **kernel sweep (ms/iter)**:")
        for key, v in sorted(rec["per_iter_ms"].items()):
            out.append(f"    * {key}: {v}")
    parity = [ln for ln in kv3.splitlines() if ln.startswith("parity ")]
    out.extend(f"    * {ln}" for ln in parity)

    ens = read_step(base, "ensemble")
    walls = re.findall(r"(?:E2E|end.to.end|total)[^\d]*([\d.]+)\s*s", ens,
                       re.IGNORECASE)
    out.append(f"* **ensemble E2E walls**: {walls or 'no record'}")

    reuse = last_json_line(read_step(base, "compile_reuse"))
    if isinstance(reuse, dict):
        out.append(
            f"* **serving compile-reuse**: "
            f"{reuse.get('transform_remote_compiles')} compiles across "
            f"{reuse.get('n_transform_batches')} batches; warm transform "
            f"{reuse.get('warm_transform_wall_s')} s"
        )
    else:
        out.append("* serving compile-reuse: no record")

    aot = read_step(base, "aot_probe")
    if "DESERIALIZE+RUN OK" in aot:
        out.append("* **axon SerializeExecutable**: reload path executed OK")
    elif aot:
        out.append("* axon SerializeExecutable: see log (no OK marker)")
    else:
        out.append("* axon SerializeExecutable: no record")

    for name in ("kernel_smoke", "chunks_smoke", "sparse_bench"):
        t = read_step(base, name)
        out.append(f"* {name}: {'log present (' + str(len(t.splitlines())) + ' lines)' if t else 'no record'}")

    print("\n".join(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
