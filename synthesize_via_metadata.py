#!/usr/bin/env python3
"""Metadata-file batch synthesis (compatibility entry point).

The reference README documents this script (reference README.md:81-96);
its repo folds the functionality into ``synthesize.py --metadata-file``.
This thin wrapper keeps the documented command line working:

  python synthesize_via_metadata.py --text-file meta.txt --ckpt-path ... \
      --cfg-path ... --prompt-dir ... [--output-dir ...]
"""

from __future__ import annotations

import sys

import synthesize


def main() -> None:
    argv = sys.argv[1:]
    if not any(a.startswith(("--text-file", "--metadata-file")) for a in argv):
        print("synthesize_via_metadata.py requires --text-file", file=sys.stderr)
        sys.exit(2)
    parser = synthesize.build_arg_parser()
    args = parser.parse_args(argv)
    synthesize.main(args)


if __name__ == "__main__":
    main()
