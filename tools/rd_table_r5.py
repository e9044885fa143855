#!/usr/bin/env python
"""Compose the round-5 depth RD table (VERDICT r4 next #3).

Reads the night's summary rows:
  runs_20k/summary.jsonl        lambda=2e-3 @ 20000 (reference schedule)
  runs_depth10k/summary.jsonl   lambda=2e-3 @ 10000 (snapshot-seeded,
                                coded bytes) + lambda=7e-4 @ ~10k
plus the analytic lambda=2e-3 point at step 10000 from the training log
(printed for cross-checking the snapshot point), and prints a markdown
table with the monotonicity / spread verdict.
"""
import json
import os
import re
import sys


def rows(path):
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [json.loads(l) for l in fh if l.strip()]


def main():
    table = []
    for path, note in (("runs_20k/summary.jsonl", "20k reference schedule"),
                       ("runs_depth10k/summary.jsonl", "10k depth pair"),
                       ("runs_depth20k/summary.jsonl", "20k depth pair")):
        for r in rows(path):
            table.append((r["lmbda"], r["steps"], r, note))
    if not table:
        print("no summary rows yet"); return 1

    log = "/tmp/run20k.log"
    if os.path.exists(log):
        for line in open(log):
            m = re.search(r"step=10000 .*embed_MB=([0-9.]+)", line)
            if m:
                print(f"analytic 2e-3 @ step 10000 (train log): "
                      f"{float(m.group(1)):.3f} MB")

    print("| λ | steps | PSNR | PSNR(codec) | Δ dB | coded MB | analytic MB "
          "| SSIM | s/step |")
    print("|---|---|---|---|---|---|---|---|---|")
    for lm, st, r, note in sorted(table, key=lambda t: (t[1], t[0])):
        print(f"| {lm:g} | {st} | {r['psnr']:.3f} | {r['psnr_codec']:.3f} | "
              f"{r['delta_codec_db']:.4f} | {r['embed_MB_codec']:.4f} | "
              f"{r['embed_MB_est']:.4f} | {r['ssim']:.4f} | "
              f"{r.get('step_s', float('nan')):.2f} |")

    for name, lo_s, hi_s in (("10k", 9000, 12000), ("20k", 18000, 21000)):
        band = {lm: r for lm, st, r, _ in table if lo_s <= st <= hi_s}
        if len(band) >= 2:
            lams = sorted(band)
            lo, hi = lams[0], lams[-1]
            mb_lo = band[lo]["embed_MB_codec"]
            mb_hi = band[hi]["embed_MB_codec"]
            spread = mb_lo / mb_hi - 1.0
            mono = all(band[a]["embed_MB_codec"] >= band[b]["embed_MB_codec"]
                       - 1e-9 for a, b in zip(lams, lams[1:]))
            print(f"\n{name}-depth separation: coded(λ={lo:g}) = {mb_lo:.4f} "
                  f"MB vs coded(λ={hi:g}) = {mb_hi:.4f} MB -> spread "
                  f"{spread:+.1%}, monotone={mono}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
