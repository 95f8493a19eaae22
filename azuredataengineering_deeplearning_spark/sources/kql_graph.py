"""Kusto graph operators (``make-graph`` / ``graph-match``) compiled
to relational joins.

The reference's KQL surface (``daily_eval.py``, ``kusto_query.py``)
predates Kusto's graph semantics, but graph-match is now core KQL; a
user of the reference's Kusto-shaped pipelines can point the same
query text here. Dialect subset (documented):

* ``make-graph Src --> Dst [with NodesTable on IdCol]`` — binds the
  in-flight frame as the EDGE table (directed ``Src -> Dst``) and an
  optional node-property table from the session table map.
* ``graph-match (a)-[e]->(b)[, (b)-[f]->(c), ...] where <pred>
  project <cols>`` — FIXED-length patterns only (no ``*1..n``
  variable-length paths yet); chains may share node variables (paths,
  stars, triangles/cycles all work — a repeated variable becomes an
  equality constraint). ``<-`` reverses a hop; ``-->`` / ``--``
  (anonymous / any-direction edges) are supported.

Compilation — pure joins, no iteration, no UDFs: every hop is one
inner join of the (column-prefixed) edge table against the frame
built so far, keyed on the already-bound endpoint(s); Catalyst plans
the join order and AQE picks broadcast vs shuffle per side. Node
variables always expose the pseudo property ``id`` (the endpoint
value); a nodes table adds its columns via a LEFT join per node
variable (property decoration — a node missing from the table still
matches the structure, Kusto semantics). ``var.col`` references in
``where``/``project`` rewrite textually to the prefixed columns and
then ride the standard KQL scalar translation.

At 100 TB: each hop is an equi-join on an edge endpoint — the same
shuffle/broadcast economics as any dimensional join; a hot node
(celebrity vertex) makes a hot join key, remedied by AQE skew-join
like any other join (no window funnels, no per-path state). Pattern
length is fixed at compile time, so the plan is a static join tree —
never a driver loop.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOP = re.compile(
    r"\(\s*(\w*)\s*\)\s*"              # tail node var (may be anonymous)
    r"(<?)-(?:\[\s*(\w*)\s*\])?-(>?)"  # <-[e]- / -[e]-> / --> / <-- / --
    r"\s*(?=\()"
)


def parse_pattern(text: str) -> tuple[list[tuple[str, str, str, str]], list[str]]:
    """Parse ``(a)-[e]->(b)-[f]->(c), (c)-[g]->(a)`` into hops.

    Returns (hops, node_order): each hop is ``(src_var, edge_var,
    dst_var, direction)`` normalized so src/dst follow the EDGE
    direction ('any' keeps the written order and matches either way);
    node_order preserves first-appearance order for deterministic
    anonymous naming."""
    hops: list[tuple[str, str, str, str]] = []
    node_order: list[str] = []
    anon = [0]

    def _name(v: str, kind: str) -> str:
        if v:
            return v
        anon[0] += 1
        return f"__{kind}{anon[0]}"

    for chain in _split_top_commas(text):
        chain = chain.strip()
        pos = 0
        prev: str | None = None
        while pos < len(chain):
            m = _HOP.match(chain, pos)
            if m:
                tail, left, evar, right = (
                    m.group(1), m.group(2), m.group(3) or "", m.group(4),
                )
                # tail re-reads the previous hop's head node (the hop
                # regex only LOOKS AHEAD at its head), so a continuing
                # chain agrees with `prev` by construction — except an
                # ANONYMOUS middle node, which must reuse the name the
                # lookahead minted rather than minting a second one
                tail = prev if (not tail and prev is not None) else _name(
                    tail, "n"
                )
                ev = _name(evar, "e")
                nm = re.match(r"\(\s*(\w*)\s*\)", chain[m.end():])
                if not nm:
                    raise ValueError(
                        f"graph-match: dangling edge after {m.group(0)!r}"
                    )
                head = _name(nm.group(1), "n")
                if left and right:
                    raise ValueError(
                        f"graph-match: edge {ev!r} is both <- and ->"
                    )
                if left:
                    hops.append((head, ev, tail, "fwd"))
                elif right:
                    hops.append((tail, ev, head, "fwd"))
                else:
                    hops.append((tail, ev, head, "any"))
                for v in (tail, head):
                    if v not in node_order:
                        node_order.append(v)
                prev = head
                pos = m.end()
            else:
                nm = re.match(r"\(\s*(\w*)\s*\)\s*$", chain[pos:])
                if nm and prev is not None:
                    # trailing head node: already recorded by the
                    # previous hop's lookahead
                    break
                raise ValueError(
                    f"graph-match: unparseable pattern at {chain[pos:]!r}"
                )
    if not hops:
        raise ValueError(f"graph-match: empty pattern {text!r}")
    seen = set()
    for _, ev, _, _ in hops:
        if ev in seen:
            raise ValueError(
                f"graph-match: edge variable {ev!r} used twice"
            )
        seen.add(ev)
    return hops, node_order


def _split_top_commas(text: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in text:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def rewrite_dots(txt: str, variables: list[str]) -> str:
    """``a.name`` -> ``a_name`` for the pattern's variables (the
    prefixed physical columns)."""
    if not variables:
        return txt
    pat = r"\b(" + "|".join(re.escape(v) for v in variables) + r")\.(\w+)"
    return re.sub(pat, r"\1_\2", txt)


def graph_match(
    edges: DataFrame,
    src: str,
    dst: str,
    nodes: DataFrame | None,
    node_id: str,
    pattern: str,
    where_txt: str | None,
    project_txt: str,
    expr_fn,
) -> DataFrame:
    """Compile one graph-match over the bound graph. ``expr_fn`` is
    the KQL scalar translator (injected to avoid a circular import)."""
    hops, node_order = parse_pattern(pattern)
    bound: dict[str, str] = {}  # node var -> physical id column
    cur: DataFrame | None = None
    for u, ev, v, direction in hops:
        if direction == "any":
            # undirected hop: the edge matches in either orientation —
            # one union of the two oriented projections
            others = [c for c in edges.columns if c not in (src, dst)]
            fwd = edges.select(
                F.col(src).alias("__s"), F.col(dst).alias("__d"), *others
            )
            rev = edges.select(
                F.col(dst).alias("__s"), F.col(src).alias("__d"), *others
            )
            e = fwd.unionByName(rev)
            e = e.select(
                [F.col(c).alias(f"{ev}_{c}") for c in e.columns]
            )
            esrc, edst = f"{ev}___s", f"{ev}___d"
        else:
            e = edges.select(
                [F.col(c).alias(f"{ev}_{c}") for c in edges.columns]
            )
            esrc, edst = f"{ev}_{src}", f"{ev}_{dst}"
        conds = []
        if u in bound:
            conds.append(F.col(esrc) == F.col(bound[u]))
        if v in bound:
            conds.append(F.col(edst) == F.col(bound[v]))
        if u == v:
            conds.append(F.col(esrc) == F.col(edst))
        if cur is None:
            cur = e
            if conds:
                cur = cur.filter(reduce(lambda a, b: a & b, conds))
        else:
            if not conds:
                raise ValueError(
                    f"graph-match: hop ({u})-[{ev}]->({v}) shares no "
                    "variable with the pattern so far (disconnected "
                    "patterns are cartesian — bind a common node first)"
                )
            cur = cur.join(e, reduce(lambda a, b: a & b, conds), "inner")
        if u not in bound:
            bound[u] = esrc
        if v not in bound:
            bound[v] = edst
    # expose var.id for every node var
    for var in node_order:
        cur = cur.withColumn(f"{var}_id", F.col(bound[var]))
    # node-property decoration (LEFT join per referenced variable)
    if nodes is not None:
        for var in node_order:
            if var.startswith("__"):
                continue
            nd = nodes.select(
                F.col(node_id).alias(f"__j_{var}"),
                *[
                    F.col(c).alias(f"{var}_{c}")
                    for c in nodes.columns
                    if c != node_id
                ],
            )
            cur = cur.join(
                nd, F.col(f"{var}_id") == F.col(f"__j_{var}"), "left"
            ).drop(f"__j_{var}")
    variables = [v for v in node_order if not v.startswith("__")] + [
        ev for _, ev, _, _ in hops if not ev.startswith("__")
    ]
    if where_txt:
        cur = cur.filter(
            F.expr(expr_fn(rewrite_dots(where_txt, variables)))
        )
    outs = []
    for item in _split_top_commas(project_txt):
        item = item.strip()
        m = re.match(r"^(\w+)\s*=\s*(.+)$", item, re.S)
        if m:
            alias, body = m.group(1), m.group(2)
        else:
            dm = re.match(r"^(\w+)\.(\w+)$", item)
            if not dm:
                raise ValueError(
                    "graph-match project items must be 'alias = expr' "
                    f"or 'var.col': {item!r}"
                )
            alias, body = f"{dm.group(1)}_{dm.group(2)}", item
        outs.append(
            F.expr(expr_fn(rewrite_dots(body, variables))).alias(alias)
        )
    return cur.select(*outs)
