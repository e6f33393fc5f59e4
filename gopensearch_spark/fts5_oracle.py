"""SQLite FTS5 oracle — the reference's *actual* index+ranking backend.

gopensearch stores every document in `CREATE VIRTUAL TABLE ... USING
fts5(content)` (reference pkg/server/db.go:46-54) and FTS5 provides the
tokenizer, inverted index, and bm25() ranking. Python's stdlib sqlite3
ships the same FTS5, so rank-identity tests load the same corpus here
and compare top-k (doc_id, score) lists. Verification-only — never on
any Spark execution path.
"""

from __future__ import annotations

import sqlite3


class Fts5Oracle:
    def __init__(self) -> None:
        self.con = sqlite3.connect(":memory:")
        self.con.execute("CREATE VIRTUAL TABLE t USING fts5(content)")

    def load(self, docs: list[tuple[int, str]]) -> None:
        """docs: (doc_id, text); doc_id becomes the FTS5 rowid."""
        self.con.executemany("INSERT INTO t(rowid, content) VALUES (?, ?)", docs)
        self.con.commit()

    def match(self, query_terms: list[str], k: int = 10, mode: str = "and") -> list[tuple[int, float]]:
        """Top-k (doc_id, positive_bm25). FTS5 returns negative scores
        (more negative = better); we negate. Ties broken by rowid."""
        joiner = " " if mode == "and" else " OR "
        match_expr = joiner.join(f'"{t}"' for t in query_terms)
        rows = self.con.execute(
            "SELECT rowid, -bm25(t) AS s FROM t WHERE t MATCH ? "
            "ORDER BY s DESC, rowid ASC LIMIT ?",
            (match_expr, k),
        ).fetchall()
        return [(int(r[0]), float(r[1])) for r in rows]

    def match_raw(self, match_expr: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k for a raw FTS5 MATCH expression (phrase: '"a b"',
        prefix: 'ab*')."""
        rows = self.con.execute(
            "SELECT rowid, -bm25(t) AS s FROM t WHERE t MATCH ? "
            "ORDER BY s DESC, rowid ASC LIMIT ?",
            (match_expr, k),
        ).fetchall()
        return [(int(r[0]), float(r[1])) for r in rows]

    def vocab(self) -> list[tuple[str, int, int]]:
        """(term, df, total_tf) from fts5vocab — pins tokenizer parity."""
        self.con.execute("CREATE VIRTUAL TABLE IF NOT EXISTS v USING fts5vocab(t, 'row')")
        return [
            (r[0], int(r[1]), int(r[2]))
            for r in self.con.execute("SELECT term, doc, cnt FROM v ORDER BY term")
        ]

    def close(self) -> None:
        self.con.close()
