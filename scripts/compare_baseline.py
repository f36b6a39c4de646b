#!/usr/bin/env python
"""Compare a bench.py JSON line against the reference's published ratios.

The reference warns its absolute numbers are hardware-specific and says to
read the RATIOS (BASELINE.md, quoting benchmarks/README.md:118). This
script turns a ``bench.py`` output line into the same ratio table so a
run can be judged at a glance:

    python bench.py > /tmp/bench.json
    python scripts/compare_baseline.py /tmp/bench.json

Reference ratio sources (see BASELINE.md for the full provenance):
  pack_streaming/pack      5.80x time, 0.42x rss   (large preset)
  pack_no_child_order/pack 0.89x time, 1.00x rss   (large preset)
  pack_split_join/pack     1.17x time, 0.94x rss   (parent_heavy preset)
"""

from __future__ import annotations

import json
import sys

# (label, numerator key, denominator key, ref time ratio, ref rss ratio)
REFERENCE_RATIOS = [
    ("pack_streaming / pack", "pack_streaming", "pack", 5.80, 0.42),
    ("pack_no_child_order / pack", "pack_no_child_order", "pack", 0.89, 1.00),
    (
        "pack_split_join / pack (parent_heavy)",
        "pack_split_join_parent_heavy",
        "pack_parent_heavy",
        1.17,
        0.94,
    ),
]


def main(path: str) -> int:
    with open(path) as f:
        bench = json.loads(f.readline())
    times = bench["queries"]
    rss = bench.get("peak_rss_mb", {})

    print(f"sf={bench.get('sf')}  total={bench.get('value')}s")
    print(f"{'ratio':<42}{'ours':>8}{'ref':>8}{'ours rss':>10}{'ref rss':>9}")
    worse = 0
    for label, num, den, ref_t, ref_r in REFERENCE_RATIOS:
        if num not in times or den not in times:
            print(f"{label:<42}{'—':>8}{ref_t:>8.2f}")
            continue
        ours_t = times[num] / times[den]
        ours_r = rss[num] / rss[den] if num in rss and den in rss else float("nan")
        # grading target: within 2x of the reference ratio (BASELINE.md)
        flag = "" if ours_t <= 2 * ref_t else "  << slower than 2x target"
        if flag:
            worse += 1
        print(
            f"{label:<42}{ours_t:>7.2f}x{ref_t:>7.2f}x"
            f"{ours_r:>9.2f}x{ref_r:>8.2f}x{flag}"
        )
    return 1 if worse else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/dev/stdin"))
