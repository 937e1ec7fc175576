"""Single-document CLI — reference ``pdfplumber/cli.py`` parity
(stdin/file in, JSON/CSV/structure JSON on stdout). The corpus-scale
surface is ``jobs.py`` (spark-submit over a pages table); this tool
serves the reference's interactive one-file workflow:

    python -m pdfplumber_spark.cli doc.pdf --format json --pages 1-2 5
    python -m pdfplumber_spark.cli doc.pdf --format csv --precision 3
    python -m pdfplumber_spark.cli doc.pdf --structure-text
"""

from __future__ import annotations

import argparse
import json
import sys
from itertools import chain
from typing import List

from . import api


def parse_page_spec(p_str: str) -> List[int]:
    """cli.py:12-17: '3' or '2-5' -> page-number list."""
    if "-" in p_str:
        start, end = map(int, p_str.split("-"))
        return list(range(start, end + 1))
    return [int(p_str)]


def parse_args(args_raw: List[str]) -> argparse.Namespace:
    parser = argparse.ArgumentParser("pdfplumber_spark.cli")
    parser.add_argument(
        "infile", nargs="?", type=argparse.FileType("rb"),
        default=sys.stdin.buffer,
    )
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--structure", action="store_true",
                       help="Write the structure tree as JSON.")
    group.add_argument("--structure-text", action="store_true",
                       help="Structure tree JSON including text contents.")
    parser.add_argument("--format", choices=["csv", "json"], default="csv")
    parser.add_argument("--types", nargs="+")
    parser.add_argument("--include-attrs", nargs="+")
    parser.add_argument("--exclude-attrs", nargs="+")
    parser.add_argument("--laparams", type=json.loads)
    parser.add_argument("--precision", type=int)
    parser.add_argument("--pages", nargs="+", type=parse_page_spec)
    parser.add_argument("--indent", type=int)
    args = parser.parse_args(args_raw)
    if args.pages is not None:
        args.pages = list(chain(*args.pages))
    return args


def main(args_raw=None) -> None:
    args = parse_args(sys.argv[1:] if args_raw is None else args_raw)
    data = args.infile.read()
    if args.structure or args.structure_text:
        # cli.py:98-104: only --pages/--laparams/--indent apply
        from .kernel.structure import tree_to_json

        tree = json.loads(tree_to_json(
            data, with_text=args.structure_text, laparams=args.laparams,
            pages=args.pages,
        ))
        print(json.dumps(tree, indent=args.indent, ensure_ascii=False))
        return
    pdf = api.open(data, pages=args.pages, laparams=args.laparams)
    if args.format == "csv":
        pdf.to_csv(
            sys.stdout, args.types, precision=args.precision,
            include_attrs=args.include_attrs,
            exclude_attrs=args.exclude_attrs,
        )
    else:
        pdf.to_json(
            sys.stdout, args.types, precision=args.precision,
            include_attrs=args.include_attrs,
            exclude_attrs=args.exclude_attrs, indent=args.indent,
        )


if __name__ == "__main__":
    main()
