#!/usr/bin/env python
"""Summarize results/<dataset>/output.txt TSV rows as a markdown RD table.

The TSV layout is the reference driver's (train/driver.py:append_result_row,
reference train_CNC_nerf_synthetic.py:562-613): 12 fixed columns, a group of
6 per MLP-quantization digit, then 5 fixed tail columns (train/encode/decode
seconds + the raw-table-MB / compression-factor extension columns).

    python tools/summarize_runs.py [results/Procedural/output.txt ...]
"""

import glob
import sys

HEAD = ["scene", "psnr", "lpips", "-ssim", "psnr_codec", "lpips_codec",
        "-ssim_codec", "embed_MB_est", "embed_MB_codec", "mlp_MB_orig",
        "context_MB", "binary_vxl_MB"]
QUANT = ["digits", "mlp_MB", "psnr", "lpips", "-ssim", "total_MB"]
TAIL = ["train_s", "encode_s", "decode_s", "raw_table_MB", "compression_x"]


def parse_row(line):
    cols = line.rstrip("\n").split("\t")
    n_quant = (len(cols) - len(HEAD) - len(TAIL)) // len(QUANT)
    row = dict(zip(HEAD, cols))
    row["quant"] = []
    for i in range(n_quant):
        base = len(HEAD) + i * len(QUANT)
        row["quant"].append(dict(zip(QUANT, cols[base:base + len(QUANT)])))
    row.update(zip(TAIL, cols[len(HEAD) + n_quant * len(QUANT):]))
    return row


def fnum(v, nd=2):
    try:
        return f"{float(v):.{nd}f}"
    except (TypeError, ValueError):
        return str(v)


def main(paths):
    if not paths:
        paths = sorted(glob.glob("results/*/output.txt"))
    rows = []
    for p in paths:
        with open(p) as fh:
            rows += [parse_row(l) for l in fh if l.strip()]
    if not rows:
        print("no result rows found", file=sys.stderr)
        return 1
    print("| scene | PSNR | PSNR(codec) | Δcodec dB | size MB (best q) "
          "| raw MB | ratio | train s | enc s | dec s |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        try:
            d = float(r["psnr_codec"]) - float(r["psnr"])
            delta = f"{d:+.3f}"
        except ValueError:
            delta = "n/a"
        best = ""
        if r["quant"]:
            # best quant digit = max PSNR; its total_MB is the bundle size
            q = max(r["quant"],
                    key=lambda q: float(q["psnr"])
                    if q["psnr"] not in ("n/a",) else -1e9)
            best = f"{fnum(q['total_MB'], 3)} (q{q['digits']})"
        print(f"| {r['scene']} | {fnum(r['psnr'])} | {fnum(r['psnr_codec'])}"
              f" | {delta} | {best} | {fnum(r['raw_table_MB'], 1)}"
              f" | {fnum(r['compression_x'], 1)}x | {fnum(r['train_s'], 0)}"
              f" | {fnum(r['encode_s'], 0)} | {fnum(r['decode_s'], 0)} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
