"""Solution-assembly kernels ported from the reference's linkback stage.

These are the row-local pieces of SMAPH's final stage (binding accepted
candidates into a consistent solution), kept as pure functions: the
distributed recast is the connected-components clustering
(operators/clustering.py), but the greedy token-cover rule and the
bounded binding enumeration are preserved (and golden-tested) because
they define the tie-breaking semantics the scorer relies on.
"""

from __future__ import annotations

from smaph_spark.functions.kernels import min_edit_dist, tokenize


def baseline_linkback(
    query: str, entity_to_bolds: dict[int, list[str]]
) -> list[tuple[int, int, int, float]]:
    """Rule-based linkback (linkback/BaselineLinkBack.java:30-114):

    1. per entity keep the bold with minimum min_edit_dist (ties: last
       bold in list order, matching the reference's `<=` update);
    2. sort (bold, entity) by increasing ED (ties: entity id, for
       determinism where the reference inherits HashMap order);
    3. greedily cover query tokens in ED order; each selection emits an
       annotation spanning min..max covered token positions.

    Returns [(position, length, entity, score=1.0)] sorted by position.
    """
    # step 1 — best bold per entity; a bold claimed twice keeps the
    # LAST entity (reference HashMap.put overwrite, iteration made
    # deterministic by sorting entity ids)
    bold_to_entity: dict[str, int] = {}
    for entity in sorted(entity_to_bolds):
        bolds = entity_to_bolds[entity]
        best_bold, best_ed = None, float("inf")
        for bold in bolds:
            ed = min_edit_dist(query, bold)
            if ed <= best_ed:
                best_bold, best_ed = bold, ed
        if best_bold is not None:
            bold_to_entity[best_bold] = entity

    # step 2 — ED + covered tokens per (bold, entity)
    triples = []
    for bold, entity in bold_to_entity.items():
        covered: list[str] = []
        ed = min_edit_dist(query, bold, covered)
        triples.append((ed, covered, entity))
    triples.sort(key=lambda t: (t[0], t[2]))

    # step 3 — greedy token cover
    tokens = [t.lower() for t in tokenize(query)]
    low_query = query.lower()
    token_pos: list[int] = []
    last = 0
    for tok in tokens:
        last = low_query.index(tok, last)
        token_pos.append(last)
    to_cover = set(range(len(tokens)))

    result: list[tuple[int, int, int, float]] = []
    for ed, covered, entity in triples:
        if not to_cover:
            break
        min_pos = max_pos = -1
        for tok in covered:
            pos = tokens.index(tok) if tok in tokens else -1
            if pos not in to_cover:
                continue
            if pos != -1 and (min_pos == -1 or min_pos > pos):
                min_pos = pos
            if max_pos == -1 or max_pos < pos:
                max_pos = pos
        if min_pos != -1:
            for j in range(min_pos, max_pos + 1):
                to_cover.discard(j)
            start = token_pos[min_pos]
            end = token_pos[max_pos] + len(tokens[max_pos])
            result.append((start, end - start, entity, 1.0))
    return sorted(result)


def bindings(candidates: list[list[int]], max_bindings: int) -> list[list[int]]:
    """All per-segment candidate combinations, DFS order, capped
    (SmaphUtils.getBindings / populateBindingsRec, :741-767; cap
    semantics like DefaultBindingGenerator.java:22-24 — "no silent
    caps": callers log when len(result) == max_bindings)."""
    out: list[list[int]] = []

    def rec(chosen: list[int]) -> None:
        if 0 < max_bindings <= len(out):
            return
        if len(chosen) == len(candidates):
            out.append(list(chosen))
            return
        for cand in candidates[len(chosen)]:
            rec(chosen + [cand])

    rec([])
    return out
