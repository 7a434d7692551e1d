"""MATLAB AST node definitions.

Reference parity: runmat-parser/src/ast.rs:6-177 (Expr/Stmt). Lean dataclass
nodes; spans carry only the line (enough for MException stacks).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


class Node:
    __slots__ = ()


# --------------------------------------------------------------------------- #
# expressions
# --------------------------------------------------------------------------- #

@dataclass
class Num(Node):
    value: float
    is_imag: bool = False
    is_int_literal: bool = False


@dataclass
class Str(Node):          # 'char literal'
    value: str


@dataclass
class DQStr(Node):        # "string literal"
    value: str


@dataclass
class Ident(Node):
    name: str
    line: int = 0


@dataclass
class Colon(Node):        # bare ':' used as an index
    pass


@dataclass
class EndRef(Node):       # 'end' inside an index expression
    pass


@dataclass
class Range(Node):
    start: Node
    step: Optional[Node]
    stop: Node


@dataclass
class BinOp(Node):
    op: str
    left: Node
    right: Node


@dataclass
class UnOp(Node):
    op: str               # '-', '+', '~'
    operand: Node


@dataclass
class PostOp(Node):
    op: str               # "'" (ctranspose) or ".'" (transpose)
    operand: Node


@dataclass
class Index(Node):
    """base(args) or base{args}. Paren form is call-or-index, resolved at
    lowering time against the symbol table (reference: runmat-hir resolution)."""
    base: Node
    args: list
    kind: str             # 'paren' | 'brace'


@dataclass
class FieldAccess(Node):
    base: Node
    name: Optional[str]   # static field
    dynamic: Optional[Node] = None  # s.(expr)


@dataclass
class MatrixLit(Node):
    rows: list            # list[list[Node]]


@dataclass
class CellLit(Node):
    rows: list


@dataclass
class AnonFunc(Node):
    params: list
    body: Node


@dataclass
class FuncHandle(Node):
    name: str


# --------------------------------------------------------------------------- #
# statements
# --------------------------------------------------------------------------- #

@dataclass
class ExprStmt(Node):
    expr: Node
    display: bool
    line: int = 0


@dataclass
class Assign(Node):
    lhs: Node             # Ident | Index | FieldAccess chain
    rhs: Node
    display: bool
    line: int = 0


@dataclass
class MultiAssign(Node):
    lhs: list             # elements: Ident | Index | FieldAccess | None (~ placeholder)
    rhs: Node
    display: bool
    line: int = 0


@dataclass
class If(Node):
    branches: list        # list[(cond, body)]
    else_body: Optional[list]
    line: int = 0


@dataclass
class While(Node):
    cond: Node
    body: list
    line: int = 0


@dataclass
class For(Node):
    var: str
    expr: Node
    body: list
    line: int = 0
    is_parfor: bool = False


@dataclass
class Switch(Node):
    expr: Node
    cases: list           # list[(case_expr, body)]
    otherwise: Optional[list]
    line: int = 0


@dataclass
class TryCatch(Node):
    body: list
    catch_var: Optional[str]
    catch_body: list
    line: int = 0


@dataclass
class Break(Node):
    line: int = 0


@dataclass
class Continue(Node):
    line: int = 0


@dataclass
class Return(Node):
    line: int = 0


@dataclass
class Global(Node):
    names: list
    line: int = 0


@dataclass
class Persistent(Node):
    names: list
    line: int = 0


@dataclass
class Command(Node):
    name: str
    args: list            # list[str]
    line: int = 0


@dataclass
class ArgSpec(Node):
    """One entry of an arguments-validation block (≙ runmat-hir
    argument-validation model)."""
    name: str
    field_name: Optional[str]   # name.field -> name-value option bound into a struct
    dims: Optional[list]        # per-dim sizes; None element = ':' (any)
    cls: Optional[str]          # class coercion target ('double', 'char', ...)
    validators: list            # [(builtin_name, raw_args|None), ...]
    default: Optional[Node]     # default expression (evaluated in fn scope)


@dataclass
class FunctionDef(Node):
    name: str
    params: list          # may end with 'varargin'
    outs: list            # may end with 'varargout'
    body: list
    line: int = 0
    nested: list = field(default_factory=list)   # nested FunctionDefs
    arg_specs: list = field(default_factory=list)  # ArgSpec entries


@dataclass
class ClassDef(Node):
    name: str
    supers: list
    properties: list      # list[(name, default_expr|None, attrs)]
    methods: list         # list[FunctionDef]
    static_methods: list
    line: int = 0
    events: list = None   # event names declared in events blocks


@dataclass
class Program(Node):
    """A parsed source unit: script statements + local function defs."""
    body: list
    functions: dict       # name -> FunctionDef
    classes: dict         # name -> ClassDef
    is_function_file: bool = False
