"""Lexer conformance tests (≙ runmat-lexer golden-token tests, SURVEY.md §4.1)."""

import pytest

from runmat_tpu.frontend.lexer import tokenize
from runmat_tpu.errors import MatError


def kinds(src):
    return [(t.kind, t.text) for t in tokenize(src) if t.kind != "EOF"]


def test_numbers():
    assert kinds("1 2.5 .5 1e3 1.5e-3 0x1F 0b101") == [
        ("NUM", "1"), ("NUM", "2.5"), ("NUM", ".5"), ("NUM", "1e3"),
        ("NUM", "1.5e-3"), ("NUM", "0x1F"), ("NUM", "0b101")]


def test_imaginary():
    assert kinds("3i 2.5j") == [("IMAG", "3i"), ("IMAG", "2.5j")]
    # `i` alone is an identifier
    assert kinds("i")[0] == ("IDENT", "i")


def test_number_dot_operator():
    # 1.*x : the dot belongs to the elementwise operator
    assert kinds("1.*x") == [("NUM", "1"), ("OP", ".*"), ("IDENT", "x")]
    assert kinds("1.5.*x")[0] == ("NUM", "1.5")


def test_transpose_vs_string():
    ks = kinds("a' + 'str'")
    assert ks == [("IDENT", "a"), ("OP", "'"), ("OP", "+"), ("STR", "str")]
    ks = kinds("A(1)' * x")
    assert ("OP", "'") in ks
    # after comma => string
    assert kinds("f(a, 'b')")[-2] == ("STR", "b")
    # escaped quote inside char literal
    assert kinds("'it''s'") == [("STR", "it's")]


def test_double_quoted_string():
    assert kinds('"he said ""hi"""') == [("DQSTR", 'he said "hi"')]


def test_keywords_and_idents():
    ks = kinds("if endx end for_ for")
    assert ks == [("KW", "if"), ("IDENT", "endx"), ("KW", "end"),
                  ("IDENT", "for_"), ("KW", "for")]


def test_comments_and_continuation():
    assert kinds("x = 1 % comment\ny = 2") == [
        ("IDENT", "x"), ("OP", "="), ("NUM", "1"), ("NEWLINE", "\n"),
        ("IDENT", "y"), ("OP", "="), ("NUM", "2")]
    assert kinds("x = 1 + ... trailing comment\n 2") == [
        ("IDENT", "x"), ("OP", "="), ("NUM", "1"), ("OP", "+"), ("NUM", "2")]


def test_block_comment():
    src = "a = 1\n%{\nall of this\nignored %\n%}\nb = 2"
    ks = [k for k, _ in kinds(src)]
    assert ks.count("IDENT") == 2


def test_ops_longest_match():
    assert kinds("a.^b") == [("IDENT", "a"), ("OP", ".^"), ("IDENT", "b")]
    assert kinds("a~=b") == [("IDENT", "a"), ("OP", "~="), ("IDENT", "b")]
    assert kinds("a&&b||c") == [("IDENT", "a"), ("OP", "&&"), ("IDENT", "b"),
                                ("OP", "||"), ("IDENT", "c")]


def test_ws_before_flag():
    ts = [t for t in tokenize("[1 -2]") if t.kind != "EOF"]
    minus = [t for t in ts if t.text == "-"][0]
    two = [t for t in ts if t.text == "2"][0]
    assert minus.ws_before and not two.ws_before


def test_unterminated_string_raises():
    with pytest.raises(MatError):
        tokenize("x = 'oops\n")
