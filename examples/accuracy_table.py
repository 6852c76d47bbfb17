#!/usr/bin/env python
"""Aggregate accuracy-sweep results into the ACCURACY.md table shape.

Reads ``<workdir>/results.json`` files produced by
``accuracy_experiment.py --sweep`` and prints a markdown table mirroring
the reference's multi-config layout (README.md:45-54), plus the ordering
checks VERDICT round-2 item 3 asks for: QAT>=PTQ per config and
more-bits >= fewer-bits.
"""

import json
import sys

ORDER = ["W8A8KV8", "W4A8KV8", "W4A8KV4", "W4A6KV16", "W2A8KV8",
         "W1A8KV8"]


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p, json.load(f)))

    for p, r in runs:
        print(f"\n### {p} (seed {r['config']['seed']})\n")
        fp = r["fp_teacher"]
        print("| config | PTQ ppl | QAT ppl | gap recovered "
              "| PTQ margin acc | QAT margin acc |")
        print("|---|---|---|---|---|---|")
        print(f"| fp teacher | {fp['ppl']:.4f} | — | — | 1.000* | — |")
        for bits in ORDER:
            e = r.get("configs", {}).get(bits)
            if not e or "qat" not in e:
                print(f"| {bits} | (pending) | | | | |")
                continue
            ptq, qat = e["ptq"], e["qat"]
            gap = ptq["ppl"] - fp["ppl"]
            rec = (ptq["ppl"] - qat["ppl"]) / gap if gap > 1e-9 else float("nan")
            print(
                f"| {bits} | {ptq['ppl']:.4f} | {qat['ppl']:.4f} | "
                f"{100 * rec:.0f}% | {ptq['mc_margin_acc']:.4f} | "
                f"{qat['mc_margin_acc']:.4f} |"
            )
        # ordering checks
        cfgs = {b: e for b, e in r.get("configs", {}).items() if "qat" in e}
        checks = []
        for bits, e in cfgs.items():
            ok = e["qat"]["ppl"] <= e["ptq"]["ppl"] + 1e-4
            checks.append((f"QAT<=PTQ ppl @ {bits}", ok))
        for hi, lo in [("W8A8KV8", "W4A8KV8"), ("W4A8KV8", "W4A8KV4"),
                       ("W4A8KV8", "W2A8KV8"), ("W2A8KV8", "W1A8KV8")]:
            if hi in cfgs and lo in cfgs:
                ok = cfgs[hi]["qat"]["ppl"] <= cfgs[lo]["qat"]["ppl"] + 1e-4
                checks.append((f"more bits >= fewer ({hi} vs {lo})", ok))
        print()
        for name, ok in checks:
            print(f"- {'PASS' if ok else 'FAIL'}: {name}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["/root/repo/.acc_workdir/results.json"])
