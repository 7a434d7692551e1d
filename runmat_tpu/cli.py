"""Command-line interface: script runner, REPL, and subcommands.

Reference parity: runmat-cli (crates/runmat-cli/src/cli/root.rs:207-333 —
default script run + Repl/Run/Check/Version/Info/AccelInfo/GcStats/Benchmark/
Config subcommands; bootstrap initializes config, logging, and the
acceleration provider, app/bootstrap.rs:53).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)

    # subcommand style: runmat-tpu <cmd> [...]
    if argv and argv[0] in ("repl", "run", "check", "version", "info",
                            "accel-info", "gc-stats", "benchmark", "config",
                            "lsp"):
        cmd = argv[0]
        rest = argv[1:]
        return _dispatch(cmd, rest)

    p = argparse.ArgumentParser(prog="runmat-tpu",
                                description="TPU-native MATLAB-compatible runtime")
    p.add_argument("script", nargs="?", help="MATLAB script to run")
    p.add_argument("-e", "--eval", help="evaluate a snippet and exit")
    p.add_argument("--no-accel", action="store_true", help="disable the accel engine")
    p.add_argument("--accel-info", action="store_true", help="print accelerator info")
    p.add_argument("--version", action="store_true")
    args = p.parse_args(argv)

    if args.version:
        return _dispatch("version", [])
    if args.accel_info:
        return _dispatch("accel-info", [])

    sess = _make_session(no_accel=args.no_accel)
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


def _make_session(no_accel=False):
    from .session import Session
    return Session(accelerate=False if no_accel else None)


def _dispatch(cmd: str, rest: list) -> int:
    if cmd == "version":
        from . import __version__
        print(f"runmat-tpu {__version__}")
        return 0

    if cmd == "repl":
        return repl(_make_session())

    if cmd == "run":
        if not rest:
            print("usage: runmat-tpu run <script.m>", file=sys.stderr)
            return 2
        sess = _make_session()
        from .errors import MatError
        try:
            sess.run_file(rest[0])
        except MatError as e:
            print(f"Error: {e.message}", file=sys.stderr)
            return 1
        return 0

    if cmd == "check":
        return _check(rest)

    if cmd == "info":
        from . import __version__
        from .config import load
        from .runtime import registry
        registry.ensure_loaded()
        cfg = load()
        print(f"runmat-tpu {__version__}")
        print(f"builtins: {len(registry.all_builtins())}")
        print(f"config: {cfg.source or '<defaults>'}")
        if cfg.overrides:
            print(f"env overrides: {', '.join(cfg.overrides)}")
        return 0

    if cmd == "accel-info":
        as_json = "--json" in rest
        sess = _make_session()
        from . import telemetry
        from .accel import active_engine
        eng = active_engine()
        if as_json:
            print(json.dumps(telemetry.snapshot(sess), indent=2, default=str))
        elif eng is None:
            print("accelerator: none (host numpy only)")
        else:
            info = eng.device_info()
            print(f"accelerator: {info['platform']} ({info['name']}), "
                  f"{info['count']} device(s)")
            for k, v in eng.stats.items():
                print(f"  {k}: {v}")
        return 0

    if cmd == "gc-stats":
        # python is the host GC (≙ runmat gc stats); report its counters +
        # engine residency
        import gc as pygc
        sess = _make_session()
        counts = pygc.get_count()
        print(f"gc generations (collections pending): {counts}")
        from .accel import active_engine
        eng = active_engine()
        if eng is not None:
            print(f"device uploads: {eng.stats['uploads']} "
                  f"({eng.stats['upload_bytes']} bytes)")
        return 0

    if cmd == "benchmark":
        return _benchmark(rest)

    if cmd == "config":
        if "--generate" in rest or "--generate-config" in rest:
            from .config import generate_default
            path = generate_default()
            print(f"wrote {path}")
            return 0
        from .config import load
        print(json.dumps(load().describe(), indent=2, default=str))
        return 0

    if cmd == "lsp":
        from .lsp import main as lsp_main
        return lsp_main()

    print(f"unknown command '{cmd}'", file=sys.stderr)
    return 2


def _check(rest: list) -> int:
    """Static checks: parse + compile without executing (≙ runmat check)."""
    if not rest:
        print("usage: runmat-tpu check <script.m>", file=sys.stderr)
        return 2
    from .errors import MatError
    from .frontend.parser import parse
    from .vm.compiler import Compiler
    ok = True
    for path in rest:
        try:
            with open(path) as f:
                src = f.read()
            prog = parse(src, path)
            Compiler.compile_program(prog, path)
            print(f"{path}: OK")
        except MatError as e:
            ok = False
            print(f"{path}: {e.identifier}: {e.message}")
        except OSError as e:
            ok = False
            print(f"{path}: {e}")
    return 0 if ok else 1


def _benchmark(rest: list) -> int:
    """Run the bundled benchmark suite (≙ runmat benchmark)."""
    import pathlib
    import time
    sess = _make_session()
    bdir = pathlib.Path(__file__).resolve().parent.parent / "benchmarks"
    names = rest or [p.stem for p in sorted(bdir.glob("*.m"))]
    for name in names:
        src = (bdir / f"{name}.m").read_text()
        t0 = time.perf_counter()
        sess.run_source(src, name)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        sess.run_source(src, name)
        print(f"{name}: warmup {warm*1e3:.1f} ms, "
              f"rep {(time.perf_counter()-t0)*1e3:.1f} ms")
    return 0


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
