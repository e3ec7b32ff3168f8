#!/usr/bin/env python3
"""How far does the recursive-CTE oracle rebuild scale with |merges|?

The q150/q152/q153/q155/q156 oracles rebuild the committed BPE encoding
in DuckDB as a recursive CTE applying one merge per iteration over the
distinct-word table — |vocab| rows x |merges| iterations. This times
that rebuild against the merges lists BpeScaleAb fits (48/1k/8k) over
the same corpus vocabulary, to locate the honest boundary where the SQL
oracle stops being the practical verification tool and the
indexed-equals-naive differential spec (BpeIndexedProps) takes over.

Usage: python3 tools/bpe_oracle_scale.py <corpusDir> <mergesDir>
  corpusDir: dir with documents.parquet (ScaleGen.generateLongDocs)
  mergesDir: dir with merges_<n>.tsv files (BpeScaleAb output)
"""
import sys, os, glob, time
import duckdb


def enc_sql(merges):
    rows = ",\n    ".join(
        f"({i + 1}, '{l}', '{r}')" for i, (l, r) in enumerate(merges))
    return f"""WITH RECURSIVE merges(rank, l, r) AS (VALUES
    {rows}),
words AS (SELECT DISTINCT unnest(regexp_split_to_array(lower(text),
    '\\s+')) AS w FROM documents WHERE text IS NOT NULL),
w0 AS (SELECT w, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g')
    AS state FROM words WHERE length(w) > 0),
enc AS (
  SELECT w, state, 1 AS nxt FROM w0
  UNION ALL
  SELECT e.w, replace(e.state, ' ' || m.l || ' ' || m.r || ' ',
      ' ' || m.l || m.r || ' '), e.nxt + 1
  FROM enc e JOIN merges m ON m.rank = e.nxt
),
wc AS (SELECT w,
    length(state) - length(replace(state, ' ', '')) - 1 AS np
  FROM enc WHERE nxt = (SELECT max(rank) FROM merges) + 1)
SELECT count(*), sum(np) FROM wc"""


def main(corpus_dir, merges_dir):
    con = duckdb.connect()
    p = os.path.join(corpus_dir, "documents.parquet")
    # fixture tables are single files; Spark-generated corpora are dirs
    pat = p if os.path.isfile(p) else os.path.join(p, "*.parquet")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pat}')")
    nwords = con.execute(
        "SELECT count(DISTINCT w) FROM (SELECT unnest("
        "regexp_split_to_array(lower(text), '\\s+')) AS w FROM documents)"
    ).fetchone()[0]
    rows = []
    for path in sorted(glob.glob(os.path.join(merges_dir, "merges_*.tsv")),
                       key=lambda p: int(p.split("_")[-1].split(".")[0])):
        merges = [tuple(line.split("\t"))
                  for line in open(path).read().splitlines() if line]
        best = None
        for _ in range(2):
            t0 = time.time()
            out = con.execute(enc_sql(merges)).fetchone()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        rows.append({"merges": len(merges),
                     "oracle_sec": round(best, 2),
                     "sum_pieces": int(out[1])})
        print(f"merges={len(merges)} oracle_rebuild={best:.2f}s "
              f"(vocab={nwords})")
    print({"metric": "bpe_oracle_vs_vocab", "distinct_words": nwords,
           "rows": rows})


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
