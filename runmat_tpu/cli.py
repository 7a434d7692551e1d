"""Command-line interface: script runner + REPL.

Reference parity: runmat-cli (crates/runmat-cli/src/cli/root.rs:207-333 —
default script run + Repl/Run/Version/Info/AccelInfo/Benchmark subcommands).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="runmat-tpu",
                                description="TPU-native MATLAB-compatible runtime")
    p.add_argument("script", nargs="?", help="MATLAB script to run")
    p.add_argument("-e", "--eval", help="evaluate a snippet and exit")
    p.add_argument("--no-accel", action="store_true", help="disable the accel engine")
    p.add_argument("--accel-info", action="store_true", help="print accelerator info")
    p.add_argument("--version", action="store_true")
    args = p.parse_args(argv)

    if args.version:
        from . import __version__
        print(f"runmat-tpu {__version__}")
        return 0

    from .session import Session
    sess = Session(accelerate=False if args.no_accel else None)

    if args.accel_info:
        from .accel import active_engine
        eng = active_engine()
        if eng is None:
            print("accelerator: none (host numpy only)")
        else:
            info = eng.device_info()
            print(f"accelerator: {info['platform']} ({info['name']}), "
                  f"{info['count']} device(s)")
        return 0

    from .errors import MatError

    if args.eval:
        try:
            sess.run_source(args.eval, "<cli>")
        except MatError as e:
            print(f"Error: {e.message}", file=sys.stderr)
            return 1
        return 0

    if args.script:
        try:
            sess.run_file(args.script)
        except MatError as e:
            print(f"Error: {e.message}", file=sys.stderr)
            for fn, line in e.stack:
                print(f"  in {fn} (line {line})", file=sys.stderr)
            return 1
        return 0

    return repl(sess)


def repl(sess) -> int:
    from .errors import MatError
    print("runmat-tpu REPL (TPU-native MATLAB runtime). Ctrl-D to exit.")
    buf: list[str] = []
    while True:
        try:
            prompt = ">> " if not buf else ".. "
            line = input(prompt)
        except EOFError:
            print()
            return 0
        except KeyboardInterrupt:
            print("^C")
            buf = []
            continue
        buf.append(line)
        src = "\n".join(buf)
        if _needs_more(src):
            continue
        buf = []
        try:
            sess.run_source(src, "<repl>")
        except MatError as e:
            print(f"Error: {e.message}")


def _needs_more(src: str) -> bool:
    """Heuristic block-continuation check for the REPL."""
    from .frontend.lexer import tokenize
    from .errors import MatError
    try:
        toks = tokenize(src)
    except MatError:
        return False
    depth = 0
    for t in toks:
        if t.kind == "KW" and t.text in ("if", "for", "while", "switch", "try",
                                         "function", "parfor", "classdef"):
            depth += 1
        elif t.kind == "KW" and t.text == "end":
            depth = max(0, depth - 1)
    return depth > 0


if __name__ == "__main__":
    sys.exit(main())
