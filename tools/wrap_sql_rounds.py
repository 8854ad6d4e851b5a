#!/usr/bin/env python
"""One-off codemod (VERDICT r5 #1a, oracle side): wrap every ``round(...)``
call inside the SQL string literals of ``queries.py`` as
``(round(...) + 0.0)``.

Why: a rounded double that cancels to ~0 can come out as ``-0.0`` on one
engine and ``+0.0`` on the other (the r5 driver-red on
``cusum_changepoint_events``). IEEE 754 ``-0.0 + 0.0 = +0.0`` under
round-to-nearest and ``x + 0.0 = x`` for every other x, so the wrap is
value-preserving and kills the signed-zero repr divergence at every
rounding site. The Spark side is normalized once at the registry boundary
(``_normalize_result_types`` adds ``+ 0.0`` to every double output).

Mechanics: tokenize the file (py3.11 — f-strings are single STRING
tokens), collect absolute character spans of STRING tokens, and rewrite
only ``round(`` occurrences that (a) sit fully inside a string span,
(b) are not preceded by a word char or ``.`` (skips ``F.round``), and
(c) are not already wrapped. The matching ``)`` is found by a
paren-balance scan so multi-line calls are handled. Idempotent: re-runs
find nothing to change.
"""

from __future__ import annotations

import io
import re
import sys
import tokenize

PATH = sys.argv[1] if len(sys.argv) > 1 else "whiterrabbit_spark/queries.py"


def string_spans(src: str) -> list[tuple[int, int]]:
    line_start = [0]
    for line in src.split("\n")[:-1]:
        line_start.append(line_start[-1] + len(line) + 1)

    def abs_pos(row: int, col: int) -> int:
        return line_start[row - 1] + col

    spans = []
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type == tokenize.STRING:
            spans.append((abs_pos(*tok.start), abs_pos(*tok.end)))
    return spans


def main() -> None:
    src = open(PATH).read()
    spans = string_spans(src)

    def in_string(i: int, j: int) -> bool:
        return any(a <= i and j <= b for a, b in spans)

    out = []
    pos = 0
    n_wrapped = 0
    pat = re.compile(r"round\(")
    while True:
        m = pat.search(src, pos)
        if m is None:
            out.append(src[pos:])
            break
        i = m.start()
        prev = src[i - 1] if i else ""
        # balance scan for the matching close paren
        depth = 0
        j = m.end() - 1
        while j < len(src):
            if src[j] == "(":
                depth += 1
            elif src[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        j += 1  # one past the close paren
        already = src[j : j + len(" + 0.0")] == " + 0.0" and prev == "("
        if (
            re.match(r"[\w.]", prev) is None
            and in_string(i, j)
            and not already
        ):
            out.append(src[pos:i])
            out.append("(" + src[i:j] + " + 0.0)")
            n_wrapped += 1
        else:
            out.append(src[pos:j])
        pos = j

    new = "".join(out)
    if new != src:
        open(PATH, "w").write(new)
    print(f"wrapped {n_wrapped} round() sites in {PATH}")


if __name__ == "__main__":
    main()
