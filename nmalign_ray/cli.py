"""Standalone CLI: force-align two lists of strings.

Mirrors the reference's ``nmalign`` command surface
(``/root/reference/nmalign/scripts/cli.py``):

* exactly one of ``--strings1 / --files1 / --filelist1`` per side (C1);
* ``--normalization`` JSON regex program (C2);
* projection modes: indices (default), ``--show-strings``, ``--show-files``
  — split matches slice the raw string / append beg:end (C3);
* delimited stdout via ``--separator`` (C4);
* stderr aggregates: mean confidence + per-side coverage (C5).

Differences by design: ``--interactive`` is dropped (SURVEY A11 — no
prompts in a batch engine); ``--processes`` is accepted for
compatibility but ignored (parallelism lives in the Ray pipeline, not in
intra-matrix threads).

Usage::

    python -m nmalign_ray.cli --strings1 a b c --strings2 a c -s
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from .align import match


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="nmalign-ray", description="Force-align two lists of strings."
    )
    p.add_argument("-c", "--cutoff", type=float, default=0.0,
                   help="minimum score (0..1)")
    p.add_argument("-j", "--processes", type=int, default=1,
                   help="accepted for reference-CLI compatibility; ignored")
    p.add_argument("-N", "--normalization", default=None,
                   help="JSON object of regex patterns -> replacements applied "
                        "before comparison")
    p.add_argument("-x", "--allow-splits", action="store_true",
                   help="find multiple submatches if replacement scores low")
    show = p.add_mutually_exclusive_group()
    show.add_argument("-s", "--show-strings", action="store_true",
                      help="print strings themselves instead of indices")
    show.add_argument("-f", "--show-files", action="store_true",
                      help="print file names themselves instead of indices")
    p.add_argument("-S", "--separator", default="\t",
                   help="string between result columns (default: tab)")
    for side in ("1", "2"):
        g = p.add_mutually_exclusive_group(required=True)
        g.add_argument(f"--strings{side}", nargs="+", help="inline strings")
        g.add_argument(f"--files{side}", nargs="+",
                       help="file paths, one string per file")
        g.add_argument(f"--filelist{side}", type=argparse.FileType("r"),
                       help="text file with file paths of strings")
    return p


def _materialize(strings, files, filelist):
    if strings:
        return list(strings), None
    if filelist:
        files = [line.strip() for line in filelist.readlines() if line.strip()]
    texts = [open(fn, encoding="utf-8").read() for fn in files]
    return texts, list(files)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    l1, files1 = _materialize(args.strings1, args.files1, args.filelist1)
    l2, files2 = _materialize(args.strings2, args.files2, args.filelist2)
    if args.show_files and (files1 is None or files2 is None):
        print("--show-files requires file inputs on both sides", file=sys.stderr)
        return 2
    normalization = None
    if args.normalization:
        try:
            normalization = json.loads(args.normalization)
        except json.JSONDecodeError as exc:
            print(f"--normalization is not valid JSON: {exc}", file=sys.stderr)
            return 2
        if not isinstance(normalization, dict):
            print("--normalization must be a JSON object of "
                  "pattern -> replacement", file=sys.stderr)
            return 2

    res, dst = match(
        l1, l2,
        normalization=normalization,
        cutoff=args.cutoff,
        try_subseg=args.allow_splits,
    )
    if args.allow_splits:
        idx, beg, end = res
    else:
        idx = res
        beg = end = np.full(len(l1), -1, dtype=np.int64)

    scores = []
    matched1: set[int] = set()
    matched2: set[int] = set()
    for i1, i2 in enumerate(idx.tolist()):
        score = float(dst[i1])
        if i2 >= 0:
            scores.append(score)
        if args.show_strings:
            if i2 < 0:
                continue
            a = l1[i1]
            b = l2[i2]
            if beg[i1] >= 0 and end[i1] >= 0:
                b = b[beg[i1] : end[i1]]
        elif args.show_files:
            if i2 < 0:
                continue
            a = files1[i1]
            b = files2[i2]
        else:
            a, b = str(i1), str(i2)
        msg = a + args.separator + b + args.separator + "%.2f" % score
        if args.allow_splits and beg[i1] >= 0 and end[i1] >= 0:
            msg += args.separator + str(int(beg[i1])) + args.separator + str(int(end[i1]))
        print(msg)
        if i2 < 0:
            continue
        matched1.add(i1)
        matched2.add(i2)
    if scores:
        print("average alignment confidence: %d%%" % (100 * sum(scores) / len(scores)),
              file=sys.stderr)
    print("coverage of matching inputs1: %d%%" % (100 * len(matched1) / len(l1)),
          file=sys.stderr)
    print("coverage of matching inputs2: %d%%" % (100 * len(matched2) / len(l2)),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
