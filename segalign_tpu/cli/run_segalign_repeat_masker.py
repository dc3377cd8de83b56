"""run_segalign_repeat_masker: the repeat-masker driver.

Python re-implementation of
/root/reference/scripts/run_segalign_repeat_masker: temp dir, the pipeline,
then header + sort -V merge of tmp*.* interval files.
"""

from __future__ import annotations

import os
import random
import shutil
import sys

from .args import build_rm_parser, rm_config_from_args, apply_multihost_args
from ..output.merge import sorted_glob

HEADER = "#name1  zstart1 end1  name2 zstart2+  end2+\n"


def main(argv=None) -> int:
    args = build_rm_parser().parse_args(argv)
    apply_multihost_args(args)
    if not args.seq_file:
        print("You must specify a sequence file", file=sys.stderr)
        build_rm_parser().print_help(sys.stderr)
        return 1

    seq_path = os.path.realpath(args.seq_file)
    if not os.path.isfile(seq_path):
        print(f"target file {seq_path} does not exist", file=sys.stderr)
        return 4
    output_path = os.path.realpath(args.output) if args.output else None

    cwd = os.getcwd()
    if not os.access(cwd, os.W_OK):
        print(f"Cannot create output directory in {cwd} because of "
              f"permissions", file=sys.stderr)
        return 5

    if args.workdir:
        out_dir = os.path.realpath(args.workdir)
    else:
        out_dir = os.path.join(cwd, f"output_{random.randrange(32768)}")
    os.makedirs(out_dir, exist_ok=True)
    try:
        args.seq_file = seq_path
        cfg = rm_config_from_args(args)
        from ..pipeline.repeat_masker import run_repeat_masker
        run_repeat_masker(cfg, out_dir, resume=args.resume)

        if output_path:
            with open(output_path, "wb") as dst:
                dst.write(HEADER.encode())
                for path in sorted_glob(os.path.join(out_dir, "tmp*.*")):
                    with open(path, "rb") as f:
                        dst.write(f.read())
                if args.markend:
                    dst.write(b"# segalign_repeat_masker end-of-file\n")
        else:
            sys.stdout.write(HEADER)
            for path in sorted_glob(os.path.join(out_dir, "tmp*.*")):
                with open(path) as f:
                    sys.stdout.write(f.read())
            if args.markend:
                sys.stdout.write("# segalign_repeat_masker end-of-file\n")
        if not args.workdir:
            shutil.rmtree(out_dir, ignore_errors=True)
        return 0
    finally:
        pass


if __name__ == "__main__":
    sys.exit(main())
