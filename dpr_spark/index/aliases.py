"""Index aliases + rollover — the Elasticsearch alias API and the ILM
hot-phase rollover contract, as catalog metadata over this engine's
named indexes:

- an alias maps to an ordered list of generation names plus ONE write
  index (`is_write_index` in ES);
- `rollover(alias, n_docs, max_docs)` creates generation n+1 and moves
  the write pointer when the write index has reached `max_docs` — the
  ES `_rollover` conditions check, minus the age condition (no clocks
  in this engine's deterministic surface; callers gate on their own
  timestamps);
- `swap` atomically retargets an alias (the ES `_aliases` actions
  block: remove+add in one update) — readers never observe a state
  with zero or two targets;
- search over an alias = search over the UNION of its generations.
  Generations are real indexes, so the union is either
  `index.merge.merge_indexes` (global statistics — what ES computes
  per shard and sums at the coordinator) or per-generation search +
  rescore for cheap freshness.

The catalog itself is pure metadata (ES keeps it in cluster state):
one JSON file, committed with the same atomic-rename pointer swap as
the snapshot catalog — crash-safe, last-writer-wins, readable by any
executor-side driver. At 10^12 docs the catalog stays KB-sized: it
scales with generations, never with data.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from typing import Dict, List, Optional


class AliasError(RuntimeError):
    pass


class AliasCatalog:
    def __init__(self, workdir: str):
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)

    @property
    def _path(self) -> str:
        return os.path.join(self.workdir, "aliases.json")

    def _read(self) -> dict:
        if not os.path.exists(self._path):
            return {"aliases": {}}
        with open(self._path) as f:
            return json.load(f)

    def _commit(self, meta: dict) -> None:
        tmp = self._path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._path)

    # ------------------------------------------------------------ actions

    def create(self, alias: str, index_name: str) -> None:
        """Point a new alias at its first generation (write index)."""
        meta = self._read()
        if alias in meta["aliases"]:
            raise AliasError(f"alias {alias!r} exists")
        meta["aliases"][alias] = {
            "indexes": [index_name],
            "write_index": index_name,
        }
        self._commit(meta)

    def resolve(self, alias: str) -> List[str]:
        """All generations behind the alias, oldest first."""
        meta = self._read()
        if alias not in meta["aliases"]:
            raise AliasError(f"unknown alias {alias!r}")
        return list(meta["aliases"][alias]["indexes"])

    def write_index(self, alias: str) -> str:
        meta = self._read()
        if alias not in meta["aliases"]:
            raise AliasError(f"unknown alias {alias!r}")
        return meta["aliases"][alias]["write_index"]

    def rollover(
        self, alias: str, write_index_docs: int, max_docs: int
    ) -> Optional[str]:
        """ES `_rollover` with a max_docs condition: if the write index
        holds >= max_docs, mint generation n+1 (name suffix -NNNNNN,
        the ES convention), append it to the alias and move the write
        pointer; returns the new name, or None when the condition
        doesn't fire."""
        if write_index_docs < max_docs:
            return None
        meta = self._read()
        if alias not in meta["aliases"]:
            raise AliasError(f"unknown alias {alias!r}")
        a = meta["aliases"][alias]
        m = re.match(r"^(.*?)-(\d{6})$", a["write_index"])
        if m:
            new = f"{m.group(1)}-{int(m.group(2)) + 1:06d}"
        else:
            new = f"{a['write_index']}-000002"
        if new in a["indexes"]:
            raise AliasError(f"generation {new!r} already exists")
        a["indexes"].append(new)
        a["write_index"] = new
        self._commit(meta)
        return new

    def swap(self, alias: str, remove: str, add: str) -> None:
        """Atomic remove+add (one `_aliases` actions block): the commit
        is a single rename, so a concurrent reader sees the old or the
        new target set, never an intermediate."""
        meta = self._read()
        if alias not in meta["aliases"]:
            raise AliasError(f"unknown alias {alias!r}")
        a = meta["aliases"][alias]
        if remove not in a["indexes"]:
            raise AliasError(f"{remove!r} not behind {alias!r}")
        a["indexes"] = [add if n == remove else n for n in a["indexes"]]
        if a["write_index"] == remove:
            a["write_index"] = add
        self._commit(meta)

    def delete(self, alias: str) -> None:
        meta = self._read()
        meta["aliases"].pop(alias, None)
        self._commit(meta)

    def aliases(self) -> Dict[str, dict]:
        return self._read()["aliases"]


def search_alias(
    spark,
    catalog: AliasCatalog,
    alias: str,
    indexes: Dict[str, object],
    queries,
    k: int = 10,
    boosts: Optional[Dict[str, float]] = None,
):
    """BM25 top-k over every generation behind `alias`: generations
    merge WITHOUT retokenizing (dictionary union + summed df + term_id
    rewrite — global statistics, the ES coordinator contract), then the
    production segments engine searches the merged index.

    `boosts` (ES `indices_boost`): per-generation score multipliers.
    Scoring stays on the merged global statistics (stricter than ES,
    which scores each index with its own stats unless dfs_query_
    then_fetch); the boost joins each doc's origin generation AFTER
    scoring and BEFORE top-k selection. The origin map is each
    generation's docstats doc_ids — doc-sized, co-partitioned on
    doc_id, never broadcast."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dpr_spark.index.merge import merge_indexes
    from dpr_spark.query.scorer import score_exact, search, top_k

    names = catalog.resolve(alias)
    missing = [n for n in names if n not in indexes]
    if missing:
        raise AliasError(f"unregistered generations {missing}")
    gens = [indexes[n] for n in names]
    idx = gens[0] if len(gens) == 1 else merge_indexes(spark, gens)
    if not boosts:
        return search(queries, idx, k=k)
    origin = None
    for n in names:
        part = indexes[n].docstats.select(
            "doc_id", F.lit(float(boosts.get(n, 1.0))).alias("boost")
        )
        origin = part if origin is None else origin.unionByName(part)
    scored = (
        score_exact(queries, idx)
        .join(origin, "doc_id")
        .select(
            "qid", "doc_id", (F.col("score") * F.col("boost")).alias("score")
        )
    )
    return top_k(scored, k)
