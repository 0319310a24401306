"""File-stats pruning for partition-cut MERGEs — the Iceberg
file-stats-pruning analogue (Iceberg `InclusiveMetricsEvaluator`;
reference partition swap cdc/entry/schema_storage.go:632-636).

A ``drop_partition`` epoch carries a SQL predicate over the key columns.
Without stats, the MERGE must read AND rewrite every file of the
snapshot — at 100 TB that is a snapshot-sized pass for one rare DDL.
With per-file min/max of the key columns recorded in the manifest at
write time (``LakeTable._write_data``), a file whose value ranges cannot
satisfy the predicate is provably untouched and stays in ``keep_files``
verbatim — no read, no rewrite.

Soundness contract: :func:`may_match` answers "could ANY row of this
file satisfy the predicate?" and errs toward True. Anything it cannot
analyze — an unparseable predicate, a column without stats, a type
mismatch between literal and stats — returns True (read the file). A
False is a proof: every row evaluates FALSE or NULL, and under the
engine's NULL-keep delete semantics (NULL predicate ⇒ row kept) such a
file cannot lose a row to the cut.

Three-valued interval logic: each node evaluates to a pair
``(may_true, may_false)`` over the file's per-column [min, max]
intervals. NOT swaps the pair (SQL: NOT x is TRUE iff x is FALSE, and
NOT NULL = NULL, which is still not-TRUE); AND/OR combine pairs with
the sound over-approximations. NULL rows never contribute to either
side of the pair — a comparison over an all-NULL column is
(False, False), so ``c > 0 OR NOT (c > 0)`` correctly stays prunable
for an all-NULL file.

Effectiveness is layout-dependent and documented as such: under hash
bucketing a file's key ranges are wide, so equality cuts rarely prune;
cuts correlated with write recency (drop turn_idx < K on an
append-mostly feed) prune every fragment written after the cut point —
the common Iceberg retention pattern. Granularity is per BUCKET (all
files of a bucket must be provably non-matching, and the bucket must
carry no DML this epoch) because the lake's CoW, checksum, and
one-row-per-key invariants are bucket-atomic. In practice a bucket is
rewritten wholesale at every touch, so bucket ≈ file granularity.
"""
from __future__ import annotations

import re

__all__ = ["PrunePredicate"]

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<ident>`[^`]+`|[A-Za-z_][A-Za-z_0-9.]*)"
    r"|(?P<op><=|>=|<>|!=|=|<|>)"
    r"|(?P<lparen>\()"
    r"|(?P<rparen>\))"
    r"|(?P<comma>,)"
    r")"
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN", "TRUE", "FALSE", "NULL", "IS"}

# the over-approximate truth table the evaluator walks:
# a pair (may_true, may_false) per node; NULL contributes to neither side
_UNKNOWN = (True, True)


def _tokenize(text: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ValueError(f"unrecognized token at {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        tok = m.group(kind)
        if kind == "num":
            v = float(tok) if ("." in tok or "e" in tok or "E" in tok) else int(tok)
            out.append(("lit", v))
        elif kind == "str":
            out.append(("lit", tok[1:-1].replace("''", "'")))
        elif kind == "ident":
            name = tok[1:-1] if tok.startswith("`") else tok
            up = name.upper()
            if up in _KEYWORDS:
                out.append(("kw", up))
            else:
                out.append(("col", name))
        else:
            out.append((kind if kind != "op" else "op", tok))
    return out


class _Parser:
    """Recursive descent over: expr := term (OR term)*; term := factor
    (AND factor)*; factor := NOT factor | '(' expr ')' | predicate;
    predicate := operand (cmp operand | [NOT] BETWEEN lit AND lit |
    [NOT] IN '(' lit, ... ')' | IS [NOT] NULL | ε). Anything outside the
    grammar raises, and the caller treats the whole predicate as
    unanalyzable (match-all)."""

    def __init__(self, tokens: list[tuple[str, object]]):
        self.toks = tokens
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind, val=None):
        k, v = self._next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        return v

    def parse(self):
        node = self._expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens from {self._peek()[1]!r}")
        return node

    def _expr(self):
        parts = [self._term()]
        while self._peek() == ("kw", "OR"):
            self._next()
            parts.append(self._term())
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _term(self):
        parts = [self._factor()]
        while self._peek() == ("kw", "AND"):
            self._next()
            parts.append(self._factor())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _factor(self):
        k, v = self._peek()
        if (k, v) == ("kw", "NOT"):
            self._next()
            return ("not", self._factor())
        if k == "lparen":
            self._next()
            node = self._expr()
            self._expect("rparen")
            return node
        if (k, v) == ("kw", "TRUE"):
            self._next()
            return ("const", True)
        if (k, v) == ("kw", "FALSE"):
            self._next()
            return ("const", False)
        return self._predicate()

    def _operand(self):
        k, v = self._next()
        if k in ("col", "lit"):
            return (k, v)
        raise ValueError(f"expected column or literal, got {v!r}")

    def _predicate(self):
        left = self._operand()
        k, v = self._peek()
        if k == "op":
            self._next()
            right = self._operand()
            return ("cmp", v, left, right)
        if (k, v) == ("kw", "IS"):
            self._next()
            negate = False
            if self._peek() == ("kw", "NOT"):
                self._next()
                negate = True
            self._expect("kw", "NULL")
            node = ("isnull", left)
            return ("not", node) if negate else node
        negate = False
        if (k, v) == ("kw", "NOT"):
            self._next()
            negate = True
            k, v = self._peek()
        if (k, v) == ("kw", "BETWEEN"):
            self._next()
            lo = self._operand()
            self._expect("kw", "AND")
            hi = self._operand()
            node = ("and", [("cmp", ">=", left, lo), ("cmp", "<=", left, hi)])
            return ("not", node) if negate else node
        if (k, v) == ("kw", "IN"):
            self._next()
            self._expect("lparen")
            items = [self._operand()]
            while self._peek()[0] == "comma":
                self._next()
                items.append(self._operand())
            self._expect("rparen")
            node = ("or", [("cmp", "=", left, it) for it in items])
            return ("not", node) if negate else node
        raise ValueError(f"bare operand {left!r} is not a predicate")


_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "=", "!=": "!=", "<>": "<>"}


def _cmp_interval(op: str, mn, mx, v) -> tuple[bool, bool]:
    """(may_true, may_false) of ``col OP v`` over non-null values in
    [mn, mx]. Caller guarantees comparable types."""
    if op == "=":
        return (mn <= v <= mx, not (mn == mx == v))
    if op in ("!=", "<>"):
        return (not (mn == mx == v), mn <= v <= mx)
    if op == "<":
        return (mn < v, mx >= v)
    if op == "<=":
        return (mn <= v, mx > v)
    if op == ">":
        return (mx > v, mn <= v)
    if op == ">=":
        return (mx >= v, mn < v)
    return _UNKNOWN


def _comparable(a, b) -> bool:
    num = (int, float)
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return isinstance(a, str) and isinstance(b, str)


class PrunePredicate:
    """Parse-once, evaluate-per-file analyzer for a ``delete_where``
    predicate. ``may_match(stats)`` is the sound question the MERGE
    asks: could any row of a file with these key-column stats satisfy
    the predicate? ``stats`` is the manifest entry's
    ``{col: {min, max, nulls, rows}}`` dict (None ⇒ legacy entry, no
    stats ⇒ True)."""

    def __init__(self, where: str, key_cols: list[str]):
        self.key_cols = set(key_cols)
        try:
            self._ast = _Parser(_tokenize(where)).parse()
        except ValueError:
            self._ast = None  # unanalyzable → every file may match

    @property
    def analyzable(self) -> bool:
        return self._ast is not None

    def may_match(self, stats: dict | None) -> bool:
        if self._ast is None or not stats:
            return True
        return self._eval(self._ast, stats)[0]

    def _eval(self, node, stats) -> tuple[bool, bool]:
        kind = node[0]
        if kind == "const":
            return (node[1], not node[1])
        if kind == "not":
            t, f = self._eval(node[1], stats)
            return (f, t)
        if kind == "and":
            t, f = True, False
            for child in node[1]:
                ct, cf = self._eval(child, stats)
                t, f = t and ct, f or cf
            return (t, f)
        if kind == "or":
            t, f = False, True
            for child in node[1]:
                ct, cf = self._eval(child, stats)
                t, f = t or ct, f and cf
            return (t, f)
        if kind == "isnull":
            k, v = node[1]
            if k == "lit":
                return (False, True)
            s = stats.get(v)
            if s is None or s.get("rows") is None or s.get("nulls") is None:
                return _UNKNOWN
            return (s["nulls"] > 0, s["nulls"] < s["rows"])
        if kind == "cmp":
            _, op, left, right = node
            if left[0] == "lit" and right[0] == "col":
                left, right, op = right, left, _FLIP.get(op, op)
            if left[0] == "col" and right[0] == "col":
                return _UNKNOWN
            if left[0] == "lit" and right[0] == "lit":
                a, b = left[1], right[1]
                if not _comparable(a, b):
                    return _UNKNOWN
                res = {
                    "=": a == b, "!=": a != b, "<>": a != b,
                    "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
                }.get(op)
                return _UNKNOWN if res is None else (res, not res)
            col, lit = left[1], right[1]
            s = stats.get(col)
            if s is None:
                return _UNKNOWN
            mn, mx = s.get("min"), s.get("max")
            if mn is None or mx is None:
                # recorded all-NULL column: every comparison is NULL —
                # neither TRUE nor FALSE for any row
                if s.get("nulls") is not None and s.get("rows") is not None \
                        and s["nulls"] == s["rows"]:
                    return (False, False)
                return _UNKNOWN
            if not (_comparable(mn, lit) and _comparable(mx, lit)):
                return _UNKNOWN
            return _cmp_interval(op, mn, mx, lit)
        return _UNKNOWN
