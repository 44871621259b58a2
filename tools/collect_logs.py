"""Collect the campaign logs (round-4 or -5: pass the log dir) into one table.

Parses the given log dir/*.log (tpu_bench BEST lines, overlap_bench -a lines)
and prints a markdown table sorted by ms/step, ready for BENCHMARKS.md.
"""
import glob
import os
import re
import sys

LOGDIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "r5_logs")


def main():
    rows = []
    for path in sorted(glob.glob(os.path.join(LOGDIR, "*.log"))):
        name = os.path.basename(path)[:-4]
        if name == "watch":
            continue
        text = open(path).read()
        m = re.search(r"BEST\s+([\d.]+) ms/step = ([\d.e+]+) atom-steps/s\s+"
                      r"ePot/atom=(-?[\d.]+)", text)
        if m:
            rows.append((float(m.group(1)), name, float(m.group(2)),
                         float(m.group(3))))
            continue
        for ma in re.finditer(r"-a (\d):\s+([\d.]+) ms/step "
                              r"\(([\d.e+]+) atom-steps/s\)", text):
            rows.append((float(ma.group(2)), f"{name} -a {ma.group(1)}",
                         float(ma.group(3)), float("nan")))
        if "BEST" not in text and "-a 1:" not in text:
            print(f"[collect] {name}: no result "
                  f"(tail: {text.strip().splitlines()[-1] if text.strip() else 'empty'})",
                  file=sys.stderr)
    if not rows:
        print("no results yet", file=sys.stderr)
        return
    print("| run | ms/step | atom-steps/s | ePot/atom |")
    print("|---|---|---|---|")
    for ms, name, rate, epa in sorted(rows):
        print(f"| {name} | {ms:.2f} | {rate:.3e} | {epa:.6f} |")


if __name__ == "__main__":
    main()
