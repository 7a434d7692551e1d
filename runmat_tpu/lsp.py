"""Language server: stdio JSON-RPC (LSP 3.x subset).

Reference parity: runmat-lsp (crates/runmat-lsp/src/backend.rs — tower-lsp
server with diagnostics, completion, hover, document symbols). Implemented
against the LSP wire protocol directly; the analysis reuses the runtime's
parser/compiler (the `check` pipeline) and the builtin registry.
"""

from __future__ import annotations

import json
import re
import sys
from typing import Any, Optional

from .errors import MatError


class Server:
    def __init__(self, stdin=None, stdout=None):
        self.stdin = stdin or sys.stdin.buffer
        self.stdout = stdout or sys.stdout.buffer
        self.docs: dict[str, str] = {}
        self.running = True

    # -- wire ------------------------------------------------------------------

    def _read_message(self) -> Optional[dict]:
        headers = {}
        while True:
            line = self.stdin.readline()
            if not line:
                return None
            line = line.decode().strip()
            if not line:
                break
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers.get("content-length", 0))
        body = self.stdin.read(n)
        return json.loads(body)

    def _send(self, msg: dict) -> None:
        body = json.dumps(msg).encode()
        self.stdout.write(f"Content-Length: {len(body)}\r\n\r\n".encode())
        self.stdout.write(body)
        self.stdout.flush()

    def _reply(self, req: dict, result: Any) -> None:
        self._send({"jsonrpc": "2.0", "id": req.get("id"), "result": result})

    def _notify(self, method: str, params: dict) -> None:
        self._send({"jsonrpc": "2.0", "method": method, "params": params})

    # -- main loop ---------------------------------------------------------------

    def serve(self) -> int:
        while self.running:
            msg = self._read_message()
            if msg is None:
                break
            self.handle(msg)
        return 0

    def handle(self, msg: dict) -> None:
        method = msg.get("method", "")
        params = msg.get("params", {}) or {}
        if method == "initialize":
            self._reply(msg, {
                "capabilities": {
                    "textDocumentSync": 1,     # full
                    "completionProvider": {"triggerCharacters": ["."]},
                    "hoverProvider": True,
                    "documentSymbolProvider": True,
                },
                "serverInfo": {"name": "runmat-tpu-lsp"},
            })
        elif method == "initialized":
            pass
        elif method == "shutdown":
            self._reply(msg, None)
        elif method == "exit":
            self.running = False
        elif method == "textDocument/didOpen":
            doc = params["textDocument"]
            self.docs[doc["uri"]] = doc["text"]
            self._publish_diagnostics(doc["uri"])
        elif method == "textDocument/didChange":
            uri = params["textDocument"]["uri"]
            changes = params.get("contentChanges", [])
            if changes:
                self.docs[uri] = changes[-1]["text"]
            self._publish_diagnostics(uri)
        elif method == "textDocument/didClose":
            self.docs.pop(params["textDocument"]["uri"], None)
        elif method == "textDocument/completion":
            self._reply(msg, self._completions(params))
        elif method == "textDocument/hover":
            self._reply(msg, self._hover(params))
        elif method == "textDocument/documentSymbol":
            self._reply(msg, self._symbols(params))
        elif "id" in msg:
            self._reply(msg, None)

    # -- features -----------------------------------------------------------------

    def _publish_diagnostics(self, uri: str) -> None:
        src = self.docs.get(uri, "")
        diags = diagnostics(src)
        self._notify("textDocument/publishDiagnostics",
                     {"uri": uri, "diagnostics": diags})

    def _completions(self, params: dict) -> list:
        from .runtime import registry
        registry.ensure_loaded()
        uri = params["textDocument"]["uri"]
        pos = params["position"]
        src = self.docs.get(uri, "")
        prefix = _word_before(src, pos["line"], pos["character"])
        items = []
        for name, b in sorted(registry.all_builtins().items()):
            if name.startswith(prefix):
                items.append({"label": name, "kind": 3,     # Function
                              "detail": b.summary or b.category})
        # workspace-ish: identifiers in the document
        for w in sorted(set(re.findall(r"[A-Za-z_]\w*", src))):
            if w.startswith(prefix) and w != prefix and \
                    w not in registry.all_builtins():
                items.append({"label": w, "kind": 6})       # Variable
        return items[:200]

    def _hover(self, params: dict):
        from .runtime import registry
        registry.ensure_loaded()
        uri = params["textDocument"]["uri"]
        pos = params["position"]
        src = self.docs.get(uri, "")
        word = _word_at(src, pos["line"], pos["character"])
        b = registry.lookup(word) if word else None
        if b is None:
            return None
        sig = f"{b.name} — {b.category}"
        doc = b.summary or (b.fn.__doc__ or "").strip().split("\n")[0]
        return {"contents": {"kind": "markdown",
                             "value": f"**{sig}**\n\n{doc}"}}

    def _symbols(self, params: dict) -> list:
        uri = params["textDocument"]["uri"]
        src = self.docs.get(uri, "")
        out = []
        try:
            from .frontend.parser import parse
            prog = parse(src, uri)
            for name, fd in prog.functions.items():
                out.append({"name": name, "kind": 12,   # Function
                            "location": {"uri": uri, "range": _line_range(fd.line)}})
            for name, cd in prog.classes.items():
                out.append({"name": name, "kind": 5,    # Class
                            "location": {"uri": uri, "range": _line_range(cd.line)}})
        except MatError:
            pass
        return out


_SEV = {"error": 1, "warning": 2, "info": 3}


def diagnostics(src: str) -> list:
    """Parse+compile diagnostics + static lints (≙ runmat check /
    analyze_source, runmat-static-analysis/src/frontend.rs:137)."""
    from .frontend.parser import parse
    from .vm.compiler import Compiler
    try:
        prog = parse(src, "<lsp>")
        Compiler.compile_program(prog, "<lsp>")
    except MatError as e:
        line, col = _err_pos(e.message)
        return [{
            "range": {"start": {"line": line, "character": col},
                      "end": {"line": line, "character": col + 1}},
            "severity": 1,
            "source": "runmat-tpu",
            "message": f"{e.identifier}: {e.message}",
        }]
    from .analysis import analyze_source
    return [{
        "range": _line_range(f.line),
        "severity": _SEV.get(f.severity, 3),
        "source": "runmat-tpu",
        "message": f"{f.identifier}: {f.message}",
    } for f in analyze_source(src, "<lsp>")]


def _err_pos(msg: str) -> tuple:
    m = re.search(r":(\d+):(\d+)\)", msg)
    if m:
        return max(0, int(m.group(1)) - 1), max(0, int(m.group(2)) - 1)
    return 0, 0


def _line_range(line: int) -> dict:
    l0 = max(0, line - 1)
    return {"start": {"line": l0, "character": 0},
            "end": {"line": l0, "character": 1}}


def _word_before(src: str, line: int, ch: int) -> str:
    try:
        text = src.splitlines()[line][:ch]
    except IndexError:
        return ""
    m = re.search(r"[A-Za-z_]\w*$", text)
    return m.group(0) if m else ""


def _word_at(src: str, line: int, ch: int) -> str:
    try:
        text = src.splitlines()[line]
    except IndexError:
        return ""
    for m in re.finditer(r"[A-Za-z_]\w*", text):
        if m.start() <= ch <= m.end():
            return m.group(0)
    return ""


def main() -> int:
    return Server().serve()


if __name__ == "__main__":
    sys.exit(main())
