"""FTS5-compatible highlight(): wrap match instances in the original text.

Reproduces SQLite FTS5's `highlight(t, col, open, close)` (the fetch-
phase feature of the reference's backend; probed empirically):

- a term leaf wraps EVERY instance of the term individually,
- a phrase leaf wraps each whole phrase span once (first token start to
  last token end in the ORIGINAL text, separators included),
- a prefix leaf wraps every token matching the prefix,
- a NEAR group wraps only instances participating in a valid NEAR
  selection (the same trimmed-instance set its bm25 tf counts).

Highlighting is a fetch-phase operation over the final top-k hits (like
ES), so it runs on k rows, never on the corpus.
"""

from __future__ import annotations

import numpy as np

from gopensearch_spark.analysis import tokenize_with_offsets


def _leaf_spans(toks: list[tuple[str, int, int]], leaf: tuple) -> list[tuple[int, int]]:
    kind, val = leaf
    if kind == "term":
        return [(s, e) for t, s, e in toks if t == val]
    if kind == "prefix":
        return [(s, e) for t, s, e in toks if t.startswith(val)]
    if kind == "phrase":
        terms = list(val)
        n = len(terms)
        out = []
        for i in range(len(toks) - n + 1):
            if all(toks[i + j][0] == terms[j] for j in range(n)):
                out.append((toks[i][1], toks[i + n - 1][2]))
        return out
    if kind == "near":
        units, dist = val
        from gopensearch_spark.search.phrase import _instance_intervals, _near_trimmed_tfs

        pos = {}
        for idx, (t, _, _) in enumerate(toks):
            pos.setdefault(t, []).append(idx)
        pos = {t: np.asarray(p, dtype=np.int64) for t, p in pos.items()}
        ivs = []
        for u in units:
            s, e = _instance_intervals(pos, u)
            if s.size == 0:
                return []
            ivs.append((s, e))
        out = []
        for u_i, u in enumerate(units):
            s_arr, e_arr = ivs[u_i]
            for s_tok, e_tok in zip(s_arr, e_arr):
                if _unit_instance_kept(ivs, u_i, int(s_tok), int(e_tok), dist):
                    out.append((toks[s_tok][1], toks[e_tok][2]))
        return out
    raise ValueError(f"unsupported highlight leaf {kind!r}")


def _unit_instance_kept(ivs, u_i: int, s_i: int, e_i: int, n: int) -> bool:
    """Same participation rule as phrase._near_trimmed_tfs, one instance."""
    cand_lo = np.unique(np.concatenate([e for _, e in ivs]))
    for lo in cand_lo[cand_lo <= e_i]:
        hi = lo + n + 1
        if s_i > hi:
            continue
        ok = True
        for v, (s_v, e_v) in enumerate(ivs):
            if v == u_i:
                continue
            sel = s_v[(e_v >= lo) & (s_v <= hi)]
            if sel.size == 0:
                ok = False
                break
        if ok:
            return True
    return False


def highlight_text(
    text: str,
    leaves: list[tuple],
    open_tag: str = "<b>",
    close_tag: str = "</b>",
) -> str | None:
    """Render ``text`` with every match instance wrapped.

    Returns ``None`` when no leaf matches (including ``text=None``) so the
    caller can OMIT the highlight field entirely — Elasticsearch emits no
    highlight entry for hits whose match came from other clauses."""
    toks = tokenize_with_offsets(text if text is not None else "")
    spans: list[tuple[int, int]] = []
    for leaf in leaves:
        spans.extend(_leaf_spans(toks, leaf))
    if not spans:
        return None
    spans.sort()
    merged = [spans[0]]
    for s, e in spans[1:]:
        ls, le = merged[-1]
        if s <= le:  # overlapping/nested instances merge into one wrap
            merged[-1] = (ls, max(le, e))
        else:
            merged.append((s, e))
    out, last = [], 0
    for s, e in merged:
        out.append(text[last:s])
        out.append(open_tag)
        out.append(text[s:e])
        out.append(close_tag)
        last = e
    out.append(text[last:])
    return "".join(out)


def leaves_for_match(query: str, kind: str = "match") -> list[tuple]:
    """ft_specs entry -> highlight leaves (mirrors Engine routing)."""
    from gopensearch_spark.analysis import tokenize

    toks = tokenize(query)
    if not toks:  # e.g. a prefix value that normalizes to nothing
        return []
    if kind == "phrase":
        return [("phrase", toks)] if len(toks) > 1 else [("term", toks[0])]
    if kind == "prefix":
        return [("prefix", toks[0])]
    return [("term", t) for t in sorted(set(toks))]
