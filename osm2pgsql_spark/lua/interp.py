"""A minimal Lua 5.3 interpreter in pure Python.

Scope: the language subset needed to execute osm2pgsql flex configs
(reference embeds real Lua; the documented config API surface is
src/output-flex.cpp:1420-1480 and src/init.lua:16-177).  Implemented:

- values: nil/boolean/integer/float/string/table/function, with the
  5.3 integer-float distinction (1 vs 1.0 print differently, `/` is
  float division, `//` floor division)
- statements: local (multi), assignment (multi), if/elseif/else,
  while, repeat/until, numeric and generic for, do blocks, function
  declarations (incl. `function t.a:m()` sugar), local function,
  return (multi), break
- expressions: full operator set with Lua precedence, short-circuit
  and/or returning operands, `..` concat with number coercion, `#`
  length, method calls, varargs, table constructors (array + hash +
  expanding last call), multiple return values
- metatables: __index (table or function), __newindex (table or
  function), __call; setmetatable/getmetatable/rawget/rawset
- stdlib subset: base (print, type, tostring, tonumber, pairs,
  ipairs, next, select, error, assert, pcall, unpack, require),
  string (len sub upper lower rep reverse byte char format find match
  gmatch gsub), table (insert remove concat sort unpack), math (floor
  ceil abs min max sqrt huge pi maxinteger mininteger tointeger),
  os (time, date with the '!' UTC prefix)
- Lua patterns (NOT regexes): %a-%x classes, sets, captures incl.
  position captures `()`, lazy `-`, anchors, %1-%9; used by find /
  match / gmatch / gsub

Not implemented (raises LuaSyntaxError / LuaRuntimeError): goto,
coroutines, %b/%f pattern items, io/debug libraries.  These do not
appear in any reference flex config.

This module is deliberately Spark-free and fully picklable at the
*source* level: executors re-parse the chunk text (see
plans/lua_flex.py) rather than shipping ASTs.
"""

from __future__ import annotations

import math as _pymath
import re as _re
import time as _pytime


class LuaError(Exception):
    """Base class for everything the interpreter raises."""


class LuaSyntaxError(LuaError):
    pass


class LuaRuntimeError(LuaError):
    """error() and runtime type errors; `.value` is the Lua error
    value (usually a string), as seen by pcall."""

    def __init__(self, value):
        self.value = value
        super().__init__(lua_tostring(value) if not isinstance(value, str) else value)


# ---------------------------------------------------------------- values


class LuaTable:
    """Hash + border-length table.  Keys follow Lua semantics:
    integral floats normalize to integers, nil keys raise."""

    __slots__ = ("hash", "metatable")

    def __init__(self, items=None):
        self.hash: dict = {}
        self.metatable: LuaTable | None = None
        if items:
            for k, v in items.items():
                self.set(k, v)

    @staticmethod
    def _normkey(k):
        if isinstance(k, float) and k.is_integer():
            return int(k)
        return k

    def get(self, k):
        return self.hash.get(self._normkey(k))

    def set(self, k, v):
        if k is None:
            raise LuaRuntimeError("table index is nil")
        k = self._normkey(k)
        if v is None:
            self.hash.pop(k, None)
        else:
            self.hash[k] = v

    def length(self) -> int:
        n = 0
        h = self.hash
        while (n + 1) in h:
            n += 1
        return n

    def nxt(self, k):
        """next() protocol over insertion order."""
        it = iter(self.hash.items())
        if k is None:
            return next(it, None)
        k = self._normkey(k)
        for kk, _ in it:
            if kk == k:
                return next(it, None)
        raise LuaRuntimeError("invalid key to 'next'")


class LuaFunction:
    __slots__ = ("params", "is_vararg", "body", "scope", "name")

    def __init__(self, params, is_vararg, body, scope, name="?"):
        self.params = params
        self.is_vararg = is_vararg
        self.body = body
        self.scope = scope
        self.name = name


class _Scope:
    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent

    def lookup(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s
            s = s.parent
        return None


class _Break(Exception):
    pass


class _Return(Exception):
    __slots__ = ("values",)

    def __init__(self, values):
        self.values = values


def lua_type(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, LuaTable):
        return "table"
    return "function"


def _fmt_float(v: float) -> str:
    if v != v:
        return "nan"
    if v == _pymath.inf:
        return "inf"
    if v == -_pymath.inf:
        return "-inf"
    s = "%.14g" % v
    # Lua 5.3 appends ".0" when %.14g yields an integer-looking string
    if _re.fullmatch(r"-?\d+", s):
        s += ".0"
    return s


def lua_tostring(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return _fmt_float(v)
    if isinstance(v, str):
        return v
    if isinstance(v, LuaTable):
        return "table: 0x%08x" % id(v)
    return "function: 0x%08x" % id(v)


_LUA_NUMERAL_RE = _re.compile(r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?\Z")


def lua_tonumber(v, base=None):
    if base is not None:
        if not isinstance(v, str):
            raise LuaRuntimeError("bad argument to 'tonumber'")
        try:
            return int(v.strip(), int(base))
        except ValueError:
            return None
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        s = v.strip()
        try:
            if s.lower().startswith(("0x", "-0x")):
                return int(s, 16)
            i = int(s)
            return i
        except ValueError:
            pass
        # Lua 5.3 numerals only: Python float() also accepts
        # 'inf'/'infinity'/'nan', which Lua's tonumber rejects
        if not _LUA_NUMERAL_RE.match(s):
            return None
        try:
            return float(s)
        except ValueError:
            return None
    return None


def _arith_num(v, what="perform arithmetic on"):
    n = lua_tonumber(v) if not isinstance(v, bool) else None
    if n is None or isinstance(n, bool):
        raise LuaRuntimeError(f"attempt to {what} a {lua_type(v)} value")
    return n


def lua_truthy(v) -> bool:
    return v is not None and v is not False


# ---------------------------------------------------------------- lexer

_KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for",
    "function", "goto", "if", "in", "local", "nil", "not", "or",
    "repeat", "return", "then", "true", "until", "while",
}

_TOKEN_RE = _re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<longcomment>--\[(?P<lceq>=*)\[.*?\](?P=lceq)\])
  | (?P<comment>--[^\n]*)
  | (?P<longstr>\[(?P<lseq>=*)\[(?P<lsbody>.*?)\](?P=lseq)\])
  | (?P<name>[A-Za-z_]\w*)
  | (?P<hexnum>0[xX][0-9a-fA-F]+(?:\.[0-9a-fA-F]*)?(?:[pP][-+]?\d+)?)
  | (?P<number>\d+(?:\.\d*)?(?:[eE][-+]?\d+)?|\.\d+(?:[eE][-+]?\d+)?)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<op>\.\.\.|\.\.|==|~=|<=|>=|//|::|<<|>>|[-+*/%^#<>=(){}\[\];:,.&|~])
    """,
    _re.VERBOSE | _re.DOTALL,
)

_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b", "f": "\f",
    "v": "\v", "\\": "\\", '"': '"', "'": "'", "\n": "\n",
}


def _unescape(body: str) -> str:
    out = []
    i = 0
    n = len(body)
    while i < n:
        c = body[i]
        if c == "\\" and i + 1 < n:
            e = body[i + 1]
            if e in _ESCAPES:
                out.append(_ESCAPES[e])
                i += 2
            elif e == "x" and i + 3 < n:
                out.append(chr(int(body[i + 2:i + 4], 16)))
                i += 4
            elif e.isdigit():
                j = i + 1
                while j < min(i + 4, n) and body[j].isdigit():
                    j += 1
                out.append(chr(int(body[i + 1:j])))
                i = j
            elif e == "z":
                i += 2
                while i < n and body[i].isspace():
                    i += 1
            else:
                raise LuaSyntaxError(f"invalid escape sequence '\\{e}'")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(src: str):
    """-> list of (kind, value, position) plus a final ('eof', '', n)."""
    toks = []
    pos = 0
    n = len(src)
    while pos < n:
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            line = src.count("\n", 0, pos) + 1
            raise LuaSyntaxError(f"unexpected character {src[pos]!r} at line {line}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment", "longcomment"):
            # lastgroup reports the *last* matched group, which for
            # longcomment is the backref — normalize via which named
            # groups matched
            continue
        if m.group("ws") or m.group("comment") or m.group("longcomment"):
            continue
        if m.group("longstr"):
            body = m.group("lsbody")
            if body.startswith("\n"):
                body = body[1:]
            toks.append(("string", body, m.start()))
        elif m.group("name"):
            w = m.group("name")
            toks.append(("kw" if w in _KEYWORDS else "name", w, m.start()))
        elif m.group("hexnum"):
            t = m.group("hexnum")
            if "." in t or "p" in t.lower():
                toks.append(("number", float.fromhex(t), m.start()))
            else:
                toks.append(("number", int(t, 16), m.start()))
        elif m.group("number"):
            t = m.group("number")
            if "." in t or "e" in t or "E" in t:
                toks.append(("number", float(t), m.start()))
            else:
                toks.append(("number", int(t), m.start()))
        elif m.group("string"):
            toks.append(("string", _unescape(m.group("string")[1:-1]), m.start()))
        else:
            toks.append(("op", m.group("op"), m.start()))
    toks.append(("eof", "", n))
    return toks


# ---------------------------------------------------------------- parser
#
# AST: plain tuples, first element is the node kind.
# Statements:
#   ('local', [names], [exprs]) ('assign', [targets], [exprs])
#   ('callstat', expr) ('if', [(cond, block)...], else_block|None)
#   ('while', cond, block) ('repeat', block, cond)
#   ('fornum', name, start, stop, step|None, block)
#   ('forin', [names], [exprs], block) ('do', block)
#   ('return', [exprs]) ('break',) ('func', target_expr, funcbody)
#   ('localfunc', name, funcbody)
# Expressions:
#   ('nil',) ('true',) ('false',) ('num', v) ('str', v) ('vararg',)
#   ('name', n) ('index', obj, key) ('call', f, [args])
#   ('method', obj, name, [args]) ('function', params, is_vararg, block)
#   ('table', [(key|None, expr)...]) ('binop', op, l, r) ('unop', op, e)
#   ('and', l, r) ('or', l, r)


class _P:
    def __init__(self, toks, src=""):
        self.toks = toks
        self.i = 0
        self.src = src

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def _err(self, msg):
        k, v, pos = self.peek()
        line = self.src.count("\n", 0, pos) + 1
        raise LuaSyntaxError(f"{msg} near {v!r} at line {line}")

    def accept(self, kind, value=None):
        k, v, _ = self.peek()
        if k == kind and (value is None or v == value):
            self.i += 1
            return v
        return None

    def expect(self, kind, value=None):
        got = self.accept(kind, value)
        if got is None:
            self._err(f"expected {value or kind}")
        return got

    # ---- blocks / statements

    def parse_chunk(self):
        blk = self.block()
        if self.peek()[0] != "eof":
            self._err("unexpected token")
        return blk

    def block(self):
        stmts = []
        while True:
            k, v, _ = self.peek()
            if k == "eof" or (k == "kw" and v in ("end", "else", "elseif", "until")):
                return stmts
            if k == "kw" and v == "return":
                self.next()
                exprs = []
                k2, v2, _ = self.peek()
                if not (k2 == "eof" or (k2 == "kw" and v2 in ("end", "else", "elseif", "until"))
                        or (k2 == "op" and v2 == ";")):
                    exprs = self.exprlist()
                self.accept("op", ";")
                stmts.append(("return", exprs))
                return stmts
            st = self.statement()
            if st is not None:
                stmts.append(st)

    def statement(self):
        k, v, _ = self.peek()
        if k == "op" and v == ";":
            self.next()
            return None
        if k == "kw":
            if v == "local":
                self.next()
                if self.accept("kw", "function"):
                    name = self.expect("name")
                    return ("localfunc", name, self.funcbody())
                names = [self.expect("name")]
                self._skip_attrib()
                while self.accept("op", ","):
                    names.append(self.expect("name"))
                    self._skip_attrib()
                exprs = self.exprlist() if self.accept("op", "=") else []
                return ("local", names, exprs)
            if v == "if":
                self.next()
                arms = []
                cond = self.expr()
                self.expect("kw", "then")
                arms.append((cond, self.block()))
                while self.accept("kw", "elseif"):
                    c = self.expr()
                    self.expect("kw", "then")
                    arms.append((c, self.block()))
                els = self.block() if self.accept("kw", "else") else None
                self.expect("kw", "end")
                return ("if", arms, els)
            if v == "while":
                self.next()
                cond = self.expr()
                self.expect("kw", "do")
                blk = self.block()
                self.expect("kw", "end")
                return ("while", cond, blk)
            if v == "repeat":
                self.next()
                blk = self.block()
                self.expect("kw", "until")
                cond = self.expr()
                return ("repeat", blk, cond)
            if v == "for":
                self.next()
                n1 = self.expect("name")
                if self.accept("op", "="):
                    start = self.expr()
                    self.expect("op", ",")
                    stop = self.expr()
                    step = self.expr() if self.accept("op", ",") else None
                    self.expect("kw", "do")
                    blk = self.block()
                    self.expect("kw", "end")
                    return ("fornum", n1, start, stop, step, blk)
                names = [n1]
                while self.accept("op", ","):
                    names.append(self.expect("name"))
                self.expect("kw", "in")
                exprs = self.exprlist()
                self.expect("kw", "do")
                blk = self.block()
                self.expect("kw", "end")
                return ("forin", names, exprs, blk)
            if v == "do":
                self.next()
                blk = self.block()
                self.expect("kw", "end")
                return ("do", blk)
            if v == "function":
                self.next()
                target = ("name", self.expect("name"))
                is_method = False
                while True:
                    if self.accept("op", "."):
                        target = ("index", target, ("str", self.expect("name")))
                    elif self.accept("op", ":"):
                        target = ("index", target, ("str", self.expect("name")))
                        is_method = True
                        break
                    else:
                        break
                params, is_va, blk = self.funcbody()
                if is_method:
                    params = ["self"] + params
                return ("func", target, (params, is_va, blk))
            if v == "break":
                self.next()
                return ("break",)
            if v == "goto":
                self._err("goto is not supported")
        if k == "op" and v == "::":
            self._err("labels are not supported")
        # exprstat: either a call or an assignment
        e = self.suffixedexp()
        k2, v2, _ = self.peek()
        if (k2 == "op" and v2 in ("=", ",")):
            targets = [e]
            while self.accept("op", ","):
                targets.append(self.suffixedexp())
            self.expect("op", "=")
            exprs = self.exprlist()
            for t in targets:
                if t[0] not in ("name", "index"):
                    self._err("cannot assign to this expression")
            return ("assign", targets, exprs)
        if e[0] not in ("call", "method"):
            self._err("syntax error (expression is not a statement)")
        return ("callstat", e)

    def _skip_attrib(self):
        if self.accept("op", "<"):
            self.expect("name")
            self.expect("op", ">")

    def funcbody(self):
        self.expect("op", "(")
        params = []
        is_va = False
        if not self.accept("op", ")"):
            while True:
                if self.accept("op", "..."):
                    is_va = True
                    break
                params.append(self.expect("name"))
                if not self.accept("op", ","):
                    break
            self.expect("op", ")")
        blk = self.block()
        self.expect("kw", "end")
        return (params, is_va, blk)

    # ---- expressions (precedence climbing)

    _BINPRI = {
        "or": (1, 1), "and": (2, 2),
        "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
        "~=": (3, 3), "==": (3, 3),
        "..": (9, 8),  # right assoc
        "+": (10, 10), "-": (10, 10),
        "*": (11, 11), "/": (11, 11), "//": (11, 11), "%": (11, 11),
        "^": (14, 13),  # right assoc
    }
    _UNARY_PRI = 12

    def exprlist(self):
        out = [self.expr()]
        while self.accept("op", ","):
            out.append(self.expr())
        return out

    def expr(self, limit=0):
        k, v, _ = self.peek()
        if (k == "kw" and v == "not") or (k == "op" and v in ("-", "#", "~")):
            self.next()
            e = self.expr(self._UNARY_PRI)
            left = ("unop", "not" if v == "not" else v, e)
        else:
            left = self.simpleexp()
        while True:
            k, v, _ = self.peek()
            op = v if (k == "op" or (k == "kw" and v in ("and", "or"))) else None
            pri = self._BINPRI.get(op)
            if pri is None or pri[0] <= limit:
                return left
            self.next()
            right = self.expr(pri[1])
            if op == "and":
                left = ("and", left, right)
            elif op == "or":
                left = ("or", left, right)
            else:
                left = ("binop", op, left, right)

    def simpleexp(self):
        k, v, _ = self.peek()
        if k == "number":
            self.next()
            return ("num", v)
        if k == "string":
            self.next()
            return ("str", v)
        if k == "kw":
            if v == "nil":
                self.next()
                return ("nil",)
            if v == "true":
                self.next()
                return ("true",)
            if v == "false":
                self.next()
                return ("false",)
            if v == "function":
                self.next()
                return ("function",) + self.funcbody()
        if k == "op":
            if v == "...":
                self.next()
                return ("vararg",)
            if v == "{":
                return self.tablector()
        return self.suffixedexp()

    def primaryexp(self):
        if self.accept("op", "("):
            e = self.expr()
            self.expect("op", ")")
            return ("paren", e)
        name = self.accept("name")
        if name is None:
            self._err("unexpected symbol")
        return ("name", name)

    def suffixedexp(self):
        e = self.primaryexp()
        while True:
            k, v, _ = self.peek()
            if k == "op" and v == ".":
                self.next()
                e = ("index", e, ("str", self.expect("name")))
            elif k == "op" and v == "[":
                self.next()
                key = self.expr()
                self.expect("op", "]")
                e = ("index", e, key)
            elif k == "op" and v == ":":
                self.next()
                mname = self.expect("name")
                e = ("method", e, mname, self.callargs())
            elif (k == "op" and v == "(") or k == "string" or (k == "op" and v == "{"):
                e = ("call", e, self.callargs())
            else:
                return e

    def callargs(self):
        k, v, _ = self.peek()
        if k == "string":
            self.next()
            return [("str", v)]
        if k == "op" and v == "{":
            return [self.tablector()]
        self.expect("op", "(")
        if self.accept("op", ")"):
            return []
        args = self.exprlist()
        self.expect("op", ")")
        return args

    def tablector(self):
        self.expect("op", "{")
        items = []
        while True:
            if self.accept("op", "}"):
                return ("table", items)
            k, v, _ = self.peek()
            if k == "op" and v == "[":
                self.next()
                key = self.expr()
                self.expect("op", "]")
                self.expect("op", "=")
                items.append((key, self.expr()))
            elif k == "name" and self.toks[self.i + 1][:2] == ("op", "="):
                self.next()
                self.next()
                items.append((("str", v), self.expr()))
            else:
                items.append((None, self.expr()))
            if not (self.accept("op", ",") or self.accept("op", ";")):
                self.expect("op", "}")
                return ("table", items)


def parse(src: str):
    return _P(tokenize(src), src).parse_chunk()


# ------------------------------------------------------------- patterns
#
# Lua patterns are their own little language (PIL §20.2); translate to
# Python regexes.  Returns (compiled_regex, capture_kinds) where kinds
# is a list of 'str' | 'pos' per capture group.

_CLASS_MAP = {
    "a": "[a-zA-Z]", "A": "[^a-zA-Z]",
    "c": r"[\x00-\x1f]", "C": r"[^\x00-\x1f]",
    "d": "[0-9]", "D": "[^0-9]",
    "g": r"[\x21-\x7e]", "G": r"[^\x21-\x7e]",
    "l": "[a-z]", "L": "[^a-z]",
    "p": r"[!-/:-@\[-`{-~]", "P": r"[^!-/:-@\[-`{-~]",
    "s": r"[ \t\n\r\f\v]", "S": r"[^ \t\n\r\f\v]",
    "u": "[A-Z]", "U": "[^A-Z]",
    "w": "[a-zA-Z0-9]", "W": "[^a-zA-Z0-9]",
    "x": "[0-9a-fA-F]", "X": "[^0-9a-fA-F]",
}

_CLASS_INSIDE = {
    "a": "a-zA-Z", "d": "0-9", "l": "a-z", "u": "A-Z",
    "s": r" \t\n\r\f\v", "w": "a-zA-Z0-9", "x": "0-9a-fA-F",
    "p": r"!-/:-@\[-`{-~", "c": r"\x00-\x1f", "g": r"\x21-\x7e",
}


def _xlate_class_inside(c: str) -> str:
    if c in _CLASS_INSIDE:
        return _CLASS_INSIDE[c]
    if c.lower() in _CLASS_INSIDE:
        raise LuaRuntimeError(
            f"complement class %{c} inside a set is not supported")
    return _re.escape(c)


def lua_pattern_to_re(pat: str):
    """-> (compiled_python_regex, capture_kinds, anchored).  When
    `anchored`, callers must use rx.match(s, pos) — a Lua ^ anchors at
    the search start position, which Python \\A cannot express."""
    out = []
    kinds = []
    i = 0
    n = len(pat)
    anchored = False
    if pat.startswith("^"):
        anchored = True
        i = 1

    def one_item(i):
        """Translate one single-character class starting at i; returns
        (regex_fragment_or_None, next_i, quantifiable)."""
        c = pat[i]
        if c == "%":
            if i + 1 >= n:
                raise LuaRuntimeError("malformed pattern (ends with '%')")
            e = pat[i + 1]
            if e in _CLASS_MAP:
                return _CLASS_MAP[e], i + 2, True
            if e.isdigit():
                return "\\" + e, i + 2, False  # backref: not quantifiable
            if e in ("b", "f"):
                raise LuaRuntimeError(f"pattern item %{e} is not supported")
            return _re.escape(e), i + 2, True
        if c == "[":
            j = i + 1
            neg = False
            if j < n and pat[j] == "^":
                neg = True
                j += 1
            parts = []
            first = True
            while j < n and (pat[j] != "]" or first):
                first = False
                if pat[j] == "%" and j + 1 < n:
                    parts.append(_xlate_class_inside(pat[j + 1]))
                    j += 2
                elif j + 2 < n and pat[j + 1] == "-" and pat[j + 2] != "]":
                    parts.append(_re.escape(pat[j]) + "-" + _re.escape(pat[j + 2]))
                    j += 3
                else:
                    ch = pat[j]
                    parts.append("\\-" if ch == "-" else _re.escape(ch))
                    j += 1
            if j >= n:
                raise LuaRuntimeError("malformed pattern (missing ']')")
            return "[" + ("^" if neg else "") + "".join(parts) + "]", j + 1, True
        if c == ".":
            return ".", i + 1, True
        return _re.escape(c), i + 1, True

    while i < n:
        c = pat[i]
        if c == "(":
            if i + 1 < n and pat[i + 1] == ")":
                # position capture: an empty python group; the capture
                # value is reconstructed as start+1 in _match_captures
                kinds.append("pos")
                out.append("()")
                i += 2
            else:
                kinds.append("str")
                out.append("(")
                i += 1
        elif c == ")":
            out.append(")")
            i += 1
        elif c == "$" and i == n - 1:
            out.append(r"\Z")
            i += 1
        else:
            frag, i, quantifiable = one_item(i)
            # a quantifier applies only directly after a class item;
            # elsewhere * + - ? are literals (Lua semantics — this is
            # why '(-?' means 'optional minus sign', not a quantifier)
            if quantifiable and i < n and pat[i] in "*+-?":
                q = pat[i]
                out.append(frag + ("*?" if q == "-" else q))
                i += 1
            else:
                out.append(frag)
    return _re.compile("".join(out), _re.DOTALL), kinds, anchored


def _match_captures(m, kinds, whole_if_none=True):
    if not kinds:
        return [m.group(0)] if whole_if_none else []
    caps = []
    for gi, kind in enumerate(kinds, start=1):
        if kind == "pos":
            caps.append(m.start(gi) + 1)
        else:
            caps.append(m.group(gi))
    return caps


# ------------------------------------------------------------ evaluator


class Interpreter:
    """One interpreter = one global environment.  `run(src)` executes a
    chunk; `call(fn, args)` invokes a Lua function value."""

    def __init__(self):
        self.globals = LuaTable()
        self.chunk_scope: _Scope | None = None
        self._install_stdlib()

    # ---- public API

    def run(self, src: str, chunkname: str = "config"):
        ast = parse(src)
        scope = _Scope()
        # keep the chunk's top-level scope: file-local state (the w2r
        # idiom in route-relations.lua) lives here, and the flex bridge
        # snapshots/injects it across processing phases
        self.chunk_scope = scope
        self.exec_block(ast, scope)

    def call(self, fn, args: list):
        return self._call(fn, list(args))

    # ---- calls

    def _call(self, fn, args: list):
        if isinstance(fn, LuaFunction):
            scope = _Scope(fn.scope)
            for idx, p in enumerate(fn.params):
                scope.vars[p] = args[idx] if idx < len(args) else None
            if fn.is_vararg:
                scope.vars["..."] = args[len(fn.params):]
            try:
                self.exec_block(fn.body, scope)
            except _Return as r:
                return r.values
            return []
        if callable(fn):
            try:
                res = fn(*args)
            except (LuaError, _Break, _Return):
                raise
            except (TypeError, ValueError, AttributeError, KeyError, IndexError) as ex:
                # builtins applied to wrong-typed arguments must surface
                # as Lua errors (catchable by pcall), not kill the task
                # with a raw Python traceback (Lua 5.3 §2.3)
                name = getattr(fn, "__name__", "?").lstrip("_")
                raise LuaRuntimeError(f"bad argument to '{name}' ({ex})") from ex
            # convention: builtins return a tuple for multiple values
            # (empty tuple = none), anything else — including None,
            # which IS Lua nil — is one value
            if isinstance(res, tuple):
                return list(res)
            return [res]
        if isinstance(fn, LuaTable) and fn.metatable is not None:
            call = fn.metatable.get("__call")
            if call is not None:
                return self._call(call, [fn] + args)
        raise LuaRuntimeError(f"attempt to call a {lua_type(fn)} value")

    # ---- statements

    def exec_block(self, block, scope):
        for st in block:
            self.exec_stmt(st, scope)

    def exec_stmt(self, st, scope):
        op = st[0]
        if op == "local":
            _, names, exprs = st
            vals = self.eval_list(exprs, scope, len(names))
            for nm, v in zip(names, vals):
                scope.vars[nm] = v
        elif op == "assign":
            _, targets, exprs = st
            vals = self.eval_list(exprs, scope, len(targets))
            for t, v in zip(targets, vals):
                self.assign(t, v, scope)
        elif op == "callstat":
            self.eval_multi(st[1], scope)
        elif op == "if":
            _, arms, els = st
            for cond, blk in arms:
                if lua_truthy(self.eval(cond, scope)):
                    self.exec_block(blk, _Scope(scope))
                    return
            if els is not None:
                self.exec_block(els, _Scope(scope))
        elif op == "while":
            _, cond, blk = st
            while lua_truthy(self.eval(cond, scope)):
                try:
                    self.exec_block(blk, _Scope(scope))
                except _Break:
                    break
        elif op == "repeat":
            _, blk, cond = st
            while True:
                inner = _Scope(scope)
                try:
                    self.exec_block(blk, inner)
                except _Break:
                    break
                # until-cond sees the loop body's locals
                if lua_truthy(self.eval(cond, inner)):
                    break
        elif op == "fornum":
            _, name, e1, e2, e3, blk = st
            start = _arith_num(self.eval(e1, scope))
            stop = _arith_num(self.eval(e2, scope))
            step = _arith_num(self.eval(e3, scope)) if e3 is not None else 1
            if step == 0:
                raise LuaRuntimeError("'for' step is zero")
            v = start
            while (step > 0 and v <= stop) or (step < 0 and v >= stop):
                inner = _Scope(scope)
                inner.vars[name] = v
                try:
                    self.exec_block(blk, inner)
                except _Break:
                    break
                v += step
        elif op == "forin":
            _, names, exprs, blk = st
            vals = self.eval_list(exprs, scope, 3)
            f, s, ctl = vals[0], vals[1], vals[2]
            while True:
                rets = self._call(f, [s, ctl])
                if not rets or rets[0] is None:
                    break
                ctl = rets[0]
                inner = _Scope(scope)
                for idx, nm in enumerate(names):
                    inner.vars[nm] = rets[idx] if idx < len(rets) else None
                try:
                    self.exec_block(blk, inner)
                except _Break:
                    break
        elif op == "do":
            self.exec_block(st[1], _Scope(scope))
        elif op == "return":
            vals = self.eval_list(st[1], scope, -1)
            raise _Return(vals)
        elif op == "break":
            raise _Break()
        elif op == "func":
            _, target, (params, is_va, blk) = st
            fn = LuaFunction(params, is_va, blk, scope)
            self.assign(target, fn, scope)
        elif op == "localfunc":
            _, name, (params, is_va, blk) = st
            scope.vars[name] = None
            fn = LuaFunction(params, is_va, blk, scope, name)
            scope.vars[name] = fn
        else:  # pragma: no cover
            raise LuaRuntimeError(f"unknown statement {op}")

    def assign(self, target, value, scope):
        if target[0] == "name":
            s = scope.lookup(target[1])
            if s is not None:
                s.vars[target[1]] = value
            else:
                self.globals.set(target[1], value)
        elif target[0] == "index":
            obj = self.eval(target[1], scope)
            key = self.eval(target[2], scope)
            self.setindex(obj, key, value)
        else:  # pragma: no cover
            raise LuaRuntimeError("cannot assign")

    def setindex(self, obj, key, value):
        if isinstance(obj, LuaTable):
            if obj.get(key) is None and obj.metatable is not None:
                ni = obj.metatable.get("__newindex")
                if ni is not None:
                    if isinstance(ni, LuaTable):
                        self.setindex(ni, key, value)
                    else:
                        self._call(ni, [obj, key, value])
                    return
            obj.set(key, value)
            return
        raise LuaRuntimeError(f"attempt to index a {lua_type(obj)} value")

    def getindex(self, obj, key):
        if isinstance(obj, LuaTable):
            v = obj.get(key)
            if v is None and obj.metatable is not None:
                idx = obj.metatable.get("__index")
                if idx is not None:
                    if isinstance(idx, LuaTable):
                        return self.getindex(idx, key)
                    r = self._call(idx, [obj, key])
                    return r[0] if r else None
            return v
        if isinstance(obj, str):
            lib = self.globals.get("string")
            return lib.get(key) if lib is not None else None
        raise LuaRuntimeError(
            f"attempt to index a {lua_type(obj)} value"
            + (f" (key {lua_tostring(key)!r})" if key is not None else ""))

    # ---- expressions

    def eval(self, e, scope):
        r = self.eval_multi(e, scope)
        if isinstance(r, list):
            return r[0] if r else None
        return r

    def eval_multi(self, e, scope):
        """Returns a plain value, or a list for multi-value producers
        (calls, varargs)."""
        op = e[0]
        if op == "num" or op == "str":
            return e[1]
        if op == "nil":
            return None
        if op == "true":
            return True
        if op == "false":
            return False
        if op == "name":
            s = scope.lookup(e[1])
            if s is not None:
                return s.vars[e[1]]
            return self.globals.get(e[1])
        if op == "paren":
            return self.eval(e[1], scope)
        if op == "index":
            return self.getindex(self.eval(e[1], scope), self.eval(e[2], scope))
        if op == "call":
            fn = self.eval(e[1], scope)
            args = self.eval_list(e[2], scope, -1)
            return self._call(fn, args)
        if op == "method":
            obj = self.eval(e[1], scope)
            fn = self.getindex(obj, e[2])
            if fn is None:
                raise LuaRuntimeError(
                    f"attempt to call a nil value (method '{e[2]}')")
            args = self.eval_list(e[3], scope, -1)
            return self._call(fn, [obj] + args)
        if op == "and":
            l = self.eval(e[1], scope)
            return self.eval(e[2], scope) if lua_truthy(l) else l
        if op == "or":
            l = self.eval(e[1], scope)
            return l if lua_truthy(l) else self.eval(e[2], scope)
        if op == "binop":
            return self.binop(e[1], self.eval(e[2], scope), self.eval(e[3], scope))
        if op == "unop":
            return self.unop(e[1], self.eval(e[2], scope))
        if op == "function":
            return LuaFunction(e[1], e[2], e[3], scope)
        if op == "table":
            t = LuaTable()
            items = e[1]
            arr_i = 1
            for idx, (key, vexpr) in enumerate(items):
                if key is None:
                    if idx == len(items) - 1:
                        v = self.eval_multi(vexpr, scope)
                        if isinstance(v, list):
                            for vv in v:
                                t.set(arr_i, vv)
                                arr_i += 1
                            continue
                        t.set(arr_i, v)
                        arr_i += 1
                    else:
                        t.set(arr_i, self.eval(vexpr, scope))
                        arr_i += 1
                else:
                    t.set(self.eval(key, scope), self.eval(vexpr, scope))
            return t
        if op == "vararg":
            s = scope.lookup("...")
            return list(s.vars["..."]) if s is not None else []
        raise LuaRuntimeError(f"unknown expression {op}")  # pragma: no cover

    def eval_list(self, exprs, scope, want: int):
        """Evaluate an expression list with Lua's last-expands rule.
        want=-1: natural length; want>=0: pad/truncate to want."""
        vals = []
        for idx, e in enumerate(exprs):
            v = self.eval_multi(e, scope)
            if idx == len(exprs) - 1 and isinstance(v, list):
                vals.extend(v)
            elif isinstance(v, list):
                vals.append(v[0] if v else None)
            else:
                vals.append(v)
        if want >= 0:
            while len(vals) < want:
                vals.append(None)
            del vals[want:]
        return vals

    # ---- operators

    def binop(self, op, a, b):
        if op == "..":
            for v in (a, b):
                if not isinstance(v, (str, int, float)) or isinstance(v, bool):
                    raise LuaRuntimeError(
                        f"attempt to concatenate a {lua_type(v)} value")
            return lua_tostring(a) + lua_tostring(b)
        if op in ("==", "~="):
            eq = self._eq(a, b)
            return eq if op == "==" else not eq
        if op in ("<", "<=", ">", ">="):
            if isinstance(a, str) and isinstance(b, str):
                pass
            elif (isinstance(a, (int, float)) and not isinstance(a, bool)
                  and isinstance(b, (int, float)) and not isinstance(b, bool)):
                pass
            else:
                raise LuaRuntimeError(
                    f"attempt to compare {lua_type(a)} with {lua_type(b)}")
            if op == "<":
                return a < b
            if op == "<=":
                return a <= b
            if op == ">":
                return a > b
            return a >= b
        x = _arith_num(a)
        y = _arith_num(b)
        if op == "+":
            return x + y
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        if op == "/":
            return x / y if y != 0 else _div0(x)
        if op == "%":
            if y == 0:
                if isinstance(x, int) and isinstance(y, int):
                    raise LuaRuntimeError("attempt to perform 'n%%0'")
                return _pymath.nan
            return x % y
        if op == "//":
            if y == 0:
                if isinstance(x, int) and isinstance(y, int):
                    raise LuaRuntimeError("attempt to perform 'n//0'")
                return _div0(x)
            r = x // y
            return r if isinstance(x, int) and isinstance(y, int) else float(_pymath.floor(x / y))
        if op == "^":
            return float(x) ** float(y)
        raise LuaRuntimeError(f"unknown operator {op}")  # pragma: no cover

    @staticmethod
    def _eq(a, b):
        if isinstance(a, bool) or isinstance(b, bool):
            return a is b
        if a is None or b is None:
            return a is None and b is None
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            return a == b
        if isinstance(a, str) and isinstance(b, str):
            return a == b
        return a is b

    def unop(self, op, v):
        if op == "not":
            return not lua_truthy(v)
        if op == "-":
            return -_arith_num(v)
        if op == "#":
            if isinstance(v, str):
                return len(v)
            if isinstance(v, LuaTable):
                if v.metatable is not None:
                    ln = v.metatable.get("__len")
                    if ln is not None:
                        r = self._call(ln, [v])
                        return r[0] if r else None
                return v.length()
            raise LuaRuntimeError(
                f"attempt to get length of a {lua_type(v)} value")
        if op == "~":
            return ~int(_arith_num(v))
        raise LuaRuntimeError(f"unknown unary {op}")  # pragma: no cover

    # ------------------------------------------------------------ stdlib

    def _install_stdlib(self):
        g = self.globals

        def _print(*args):
            print("\t".join(lua_tostring(a) for a in args))

        def _type(v=None):
            return lua_type(v)

        def _ipairs(t):
            if not isinstance(t, LuaTable):
                raise LuaRuntimeError("bad argument #1 to 'ipairs' (table expected)")

            def it(tt, i):
                i = int(i) + 1
                v = tt.get(i)
                if v is None:
                    return None
                return (i, v)

            return (it, t, 0)

        def _next(t, k=None):
            if not isinstance(t, LuaTable):
                raise LuaRuntimeError("bad argument #1 to 'next' (table expected)")
            item = t.nxt(k)
            if item is None:
                return None
            return item

        def _pairs(t):
            if isinstance(t, LuaTable) and t.metatable is not None:
                mp = t.metatable.get("__pairs")
                if mp is not None:
                    r = self._call(mp, [t])
                    return tuple(r[:3]) + (None,) * (3 - len(r[:3]))
            if not isinstance(t, LuaTable):
                raise LuaRuntimeError("bad argument #1 to 'pairs' (table expected)")
            # stateful snapshot iterator: Lua allows deleting the
            # CURRENT key during traversal (places.lua does exactly
            # this inside its name-extraction loop); the generic
            # next(t, k) protocol can't find the successor of a deleted
            # key in a dict, so pairs() iterates a key snapshot and
            # skips entries deleted since
            keys = list(t.hash.keys())
            idx = [0]

            def it(*_ignored):
                while idx[0] < len(keys):
                    k = keys[idx[0]]
                    idx[0] += 1
                    if k in t.hash:
                        return (k, t.hash[k])
                return None

            return (it, t, None)

        def _error(msg=None, level=None):
            raise LuaRuntimeError(msg if msg is not None else "nil")

        def _assert(v=None, msg=None, *rest):
            if not lua_truthy(v):
                raise LuaRuntimeError(msg if msg is not None else "assertion failed!")
            return (v, msg) + rest if msg is not None else v

        def _pcall(f=None, *args):
            try:
                r = self._call(f, list(args))
                return tuple([True] + r)
            except LuaRuntimeError as ex:
                return (False, ex.value)
            except (_Break, _Return):
                raise
            except LuaError as ex:
                return (False, str(ex))

        def _select(n=None, *args):
            if n == "#":
                return len(args)
            n = int(_arith_num(n))
            if n < 0:
                n = len(args) + n + 1
            return tuple(args[n - 1:])

        def _rawget(t, k=None):
            return t.get(k)

        def _rawset(t, k=None, v=None):
            t.set(k, v)
            return t

        def _rawequal(a=None, b=None):
            return a is b or (not isinstance(a, LuaTable) and self._eq(a, b))

        def _setmetatable(t=None, mt=None):
            if not isinstance(t, LuaTable):
                raise LuaRuntimeError("bad argument #1 to 'setmetatable'")
            t.metatable = mt
            return t

        def _getmetatable(t=None):
            return t.metatable if isinstance(t, LuaTable) else None

        def _require(name=None):
            mod = g.get(name)
            if mod is None:
                raise LuaRuntimeError(f"module '{lua_tostring(name)}' not found")
            return mod

        def _unpack(t, i=None, j=None):
            i = 1 if i is None else int(i)
            j = t.length() if j is None else int(j)
            return tuple(t.get(k) for k in range(i, j + 1))

        g.set("print", _print)
        g.set("type", _type)
        g.set("tostring", lambda v=None: lua_tostring(v))
        g.set("tonumber", lambda v=None, b=None: lua_tonumber(v, b))
        g.set("pairs", _pairs)
        g.set("ipairs", _ipairs)
        g.set("next", _next)
        g.set("select", _select)
        g.set("error", _error)
        g.set("assert", _assert)
        g.set("pcall", _pcall)
        g.set("rawget", _rawget)
        g.set("rawset", _rawset)
        g.set("rawequal", _rawequal)
        g.set("setmetatable", _setmetatable)
        g.set("getmetatable", _getmetatable)
        g.set("require", _require)
        g.set("unpack", _unpack)
        g.set("_G", g)
        g.set("_VERSION", "Lua 5.3")

        # ---- string
        def _posrelat(pos, slen):
            if pos >= 0:
                return pos
            if -pos > slen:
                return 0
            return slen + pos + 1

        def s_sub(s, i=1, j=-1):
            slen = len(s)
            i = _posrelat(int(i), slen)
            j = _posrelat(int(j), slen)
            if i < 1:
                i = 1
            if j > slen:
                j = slen
            if i > j:
                return ""
            return s[i - 1:j]

        def s_find(s, pat, init=1, plain=None):
            slen = len(s)
            init = _posrelat(int(init), slen)
            if init < 1:
                init = 1
            if init > slen + 1:
                return None
            if lua_truthy(plain):
                idx = s.find(pat, init - 1)
                if idx < 0:
                    return None
                return (idx + 1, idx + len(pat))
            rx, kinds, anchored = lua_pattern_to_re(pat)
            m = (rx.match if anchored else rx.search)(s, init - 1)
            if m is None:
                return None
            return tuple([m.start() + 1, m.end()] + _match_captures(m, kinds, False))

        def s_match(s, pat, init=1):
            slen = len(s)
            init = _posrelat(int(init), slen)
            if init < 1:
                init = 1
            rx, kinds, anchored = lua_pattern_to_re(pat)
            m = (rx.match if anchored else rx.search)(s, init - 1)
            if m is None:
                return None
            caps = _match_captures(m, kinds)
            return tuple(caps) if len(caps) > 1 else caps[0]

        def s_gmatch(s, pat):
            rx, kinds, anchored = lua_pattern_to_re(pat)
            pos = [0]

            def it(*_ignored):
                while pos[0] <= len(s):
                    m = (rx.match if anchored else rx.search)(s, pos[0])
                    if m is None:
                        return None
                    if m.end() == m.start():
                        pos[0] = m.end() + 1
                    else:
                        pos[0] = m.end()
                    caps = _match_captures(m, kinds)
                    return tuple(caps) if len(caps) > 1 else caps[0]
                return None

            return it

        def s_gsub(s, pat, repl, maxn=None):
            rx, kinds, anchored = lua_pattern_to_re(pat)
            maxn = float("inf") if maxn is None else int(maxn)
            out = []
            pos = 0
            count = 0
            while count < maxn and pos <= len(s):
                m = (rx.match if anchored else rx.search)(s, pos)
                if m is None:
                    break
                out.append(s[pos:m.start()])
                caps = _match_captures(m, kinds)
                if isinstance(repl, str):
                    rep = []
                    k = 0
                    while k < len(repl):
                        c = repl[k]
                        if c == "%" and k + 1 < len(repl):
                            d = repl[k + 1]
                            if d == "0":
                                rep.append(m.group(0))
                            elif d.isdigit():
                                cv = caps[int(d) - 1]
                                rep.append(lua_tostring(cv))
                            else:
                                rep.append(d)
                            k += 2
                        else:
                            rep.append(c)
                            k += 1
                    out.append("".join(rep))
                elif isinstance(repl, LuaTable):
                    v = repl.get(caps[0])
                    out.append(lua_tostring(v) if lua_truthy(v) else m.group(0))
                else:
                    r = self._call(repl, list(caps))
                    v = r[0] if r else None
                    out.append(lua_tostring(v) if lua_truthy(v) else m.group(0))
                count += 1
                if m.end() == m.start():
                    if m.start() < len(s):
                        out.append(s[m.start()])
                    pos = m.end() + 1
                else:
                    pos = m.end()
                if anchored:
                    break  # Lua attempts an anchored gsub exactly once
            out.append(s[pos:])
            return ("".join(out), count)

        def s_format(fmt, *args):
            out = []
            ai = 0
            i = 0
            while i < len(fmt):
                c = fmt[i]
                if c != "%":
                    out.append(c)
                    i += 1
                    continue
                j = i + 1
                while j < len(fmt) and fmt[j] in "-+ #0123456789.":
                    j += 1
                if j >= len(fmt):
                    raise LuaRuntimeError("invalid format string to 'format'")
                conv = fmt[j]
                spec = fmt[i:j + 1]
                if conv == "%":
                    out.append("%")
                    i = j + 1
                    continue
                a = args[ai] if ai < len(args) else None
                ai += 1
                if conv in "di":
                    out.append((spec[:-1] + "d") % int(_arith_num(a)))
                elif conv == "u":
                    out.append((spec[:-1] + "d") % int(_arith_num(a)))
                elif conv in "fFgGeE":
                    out.append(spec % float(_arith_num(a)))
                elif conv in "xXo":
                    out.append(spec % int(_arith_num(a)))
                elif conv == "c":
                    out.append(chr(int(_arith_num(a))))
                elif conv == "s":
                    out.append(spec % lua_tostring(a))
                elif conv == "q":
                    q = lua_tostring(a)
                    q = q.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
                    out.append('"' + q + '"')
                else:
                    raise LuaRuntimeError(
                        f"invalid conversion '%{conv}' to 'format'")
                i = j + 1
            return "".join(out)

        string = LuaTable({
            "len": lambda s: len(s),
            "sub": s_sub,
            "upper": lambda s: s.upper(),
            "lower": lambda s: s.lower(),
            "rep": lambda s, n, sep=None: (
                ((s + (sep or "")) * max(int(n), 0))[:-len(sep)] if sep and int(n) > 0
                else s * max(int(n), 0)),
            "reverse": lambda s: s[::-1],
            "byte": lambda s, i=1, j=None: tuple(
                ord(ch) for ch in s_sub(s, i, i if j is None else j)),
            "char": lambda *cs: "".join(chr(int(c)) for c in cs),
            "format": s_format,
            "find": s_find,
            "match": s_match,
            "gmatch": s_gmatch,
            "gsub": s_gsub,
        })
        g.set("string", string)

        # ---- table
        def t_insert(t, a=None, b=None):
            if b is None:
                t.set(t.length() + 1, a)
            else:
                posn = int(_arith_num(a))
                n = t.length()
                for k in range(n, posn - 1, -1):
                    t.set(k + 1, t.get(k))
                t.set(posn, b)

        def t_remove(t, posn=None):
            n = t.length()
            if n == 0 and posn is None:
                return None
            posn = n if posn is None else int(posn)
            v = t.get(posn)
            for k in range(posn, n):
                t.set(k, t.get(k + 1))
            t.set(n, None)
            return v

        def t_concat(t, sep="", i=1, j=None):
            j = t.length() if j is None else int(j)
            parts = []
            for k in range(int(i), j + 1):
                v = t.get(k)
                if not isinstance(v, (str, int, float)) or isinstance(v, bool):
                    raise LuaRuntimeError(
                        f"invalid value (at index {k}) in table for 'concat'")
                parts.append(lua_tostring(v))
            return (sep or "").join(parts)

        def t_sort(t, comp=None):
            n = t.length()
            items = [t.get(k) for k in range(1, n + 1)]
            if comp is None:
                items.sort(key=_SortKey(self, None))
            else:
                items.sort(key=_SortKey(self, comp))
            for k, v in enumerate(items, start=1):
                t.set(k, v)

        table = LuaTable({
            "insert": t_insert,
            "remove": t_remove,
            "concat": t_concat,
            "sort": t_sort,
            "unpack": _unpack,
        })
        g.set("table", table)

        # ---- math
        def m_floor(x):
            return int(_pymath.floor(_arith_num(x)))

        def m_ceil(x):
            return int(_pymath.ceil(_arith_num(x)))

        def m_tointeger(x=None):
            n = lua_tonumber(x)
            if isinstance(n, int):
                return n
            if isinstance(n, float) and n.is_integer():
                return int(n)
            return None

        mathlib = LuaTable({
            "floor": m_floor,
            "ceil": m_ceil,
            "abs": lambda x: abs(_arith_num(x)),
            "max": lambda *xs: max(_arith_num(x) for x in xs),
            "min": lambda *xs: min(_arith_num(x) for x in xs),
            "sqrt": lambda x: _pymath.sqrt(_arith_num(x)),
            "huge": _pymath.inf,
            "pi": _pymath.pi,
            "maxinteger": 2**63 - 1,
            "mininteger": -(2**63),
            "tointeger": m_tointeger,
            "fmod": lambda a, b: _pymath.fmod(_arith_num(a), _arith_num(b)),
            "modf": lambda x: (float(int(_arith_num(x))), _arith_num(x) - int(_arith_num(x))),
            "log": lambda x, b=None: (
                _pymath.log(_arith_num(x)) if b is None
                else _pymath.log(_arith_num(x), _arith_num(b))),
            "exp": lambda x: _pymath.exp(_arith_num(x)),
            "pow": lambda a, b: float(_arith_num(a)) ** float(_arith_num(b)),
        })
        g.set("math", mathlib)

        # ---- os (time/date only; '!' prefix = UTC, as used by
        # attributes.lua's format_date)
        def os_date(fmt="%c", t=None):
            import datetime as _dt

            ts = _pytime.time() if t is None else _arith_num(t)
            if fmt.startswith("!"):
                d = _dt.datetime.fromtimestamp(ts, tz=_dt.timezone.utc)
                fmt = fmt[1:]
            else:
                d = _dt.datetime.fromtimestamp(ts)
            if fmt == "*t" or fmt == "!*t":
                return LuaTable({
                    "year": d.year, "month": d.month, "day": d.day,
                    "hour": d.hour, "min": d.minute, "sec": d.second,
                    "wday": d.isoweekday() % 7 + 1, "yday": d.timetuple().tm_yday,
                    "isdst": False,
                })
            return d.strftime(fmt)

        oslib = LuaTable({
            "time": lambda t=None: int(_pytime.time()),
            "date": os_date,
            "clock": lambda: _pytime.process_time(),
        })
        g.set("os", oslib)


def _div0(x):
    if x > 0:
        return _pymath.inf
    if x < 0:
        return -_pymath.inf
    return _pymath.nan


class _SortKey:
    """functools.cmp_to_key twin that routes through the interpreter's
    comparator (or Lua `<`) and raises Lua-style errors on mixed types."""

    __slots__ = ("interp", "comp", "value")

    def __init__(self, interp, comp, value=None):
        self.interp = interp
        self.comp = comp
        self.value = value

    def __call__(self, value):
        return _SortKey(self.interp, self.comp, value)

    def __lt__(self, other):
        a, b = self.value, other.value
        if self.comp is not None:
            r = self.interp._call(self.comp, [a, b])
            return lua_truthy(r[0] if r else None)
        return lua_truthy(self.interp.binop("<", a, b))
