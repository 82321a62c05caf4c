"""Inverted-index text retrieval: posting lists, boolean AND search,
and BM25 ranking — the query side of a training-data corpus.

A corpus pipeline doesn't just build datasets, it has to FIND things
in them (audit leaked eval docs, pull topical slices, rank
candidates). Grepping 100 TB per query is not a plan; the classic
answer is an inverted index built once and probed cheaply:

- ``build_postings``: one explode + one groupBy → (word, doc_id, tf)
  posting rows. Document lengths fall out of the same word stream.
- ``PostingsIndex``: persists postings RANGE-CLUSTERED on word
  (repartitionByRange + sortWithinPartitions), so a term lookup scans
  only the files whose [min,max] word range covers the term —
  parquet row-group pruning / table-format file skipping, the same
  mechanism audited for zorder_by in tests/test_layout.py. Build
  once; every query after is a pruned scan of a few posting files,
  never the corpus.
- ``search_all_terms``: conjunctive (AND) term search = one pruned
  posting scan + one groupBy counting matched terms == len(terms).
  No joins between per-term sets — intersection via count.
- ``bm25_topk``: Robertson/Spärck Jones BM25 (the Okapi form with
  idf = ln(1 + (N - df + ½)/(df + ½)), k1=1.2, b=0.75). Per-term df
  and the corpus constants (N, avgdl) are tiny aggregates broadcast
  into a pure projection over the pruned postings; one groupBy sums
  per-doc scores; top-k with a doc_id tie-break. Scores are rounded
  (default 6 dp) because ln()'s last ulp is libm-specific — every
  input to the formula is integer-exact, so rounded scores agree
  across engines (oracle-hash-checked in q_bm25_topk).

Scale posture: the only corpus-sized pass is the build. Queries touch
O(df) posting rows per term; df tables and corpus constants are
index metadata. Nothing here shuffles text.
"""

from __future__ import annotations

import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# The generation-pointer machinery (publish/chase/segments/tombstones/
# union reads) moved to operators/genstore.py in r14 so the vector
# index shares it; _UNSET and _is_file_vanished re-export from here
# because serving code and tests grew up importing them from this
# module.
from batch_processing_etl_orchestration_spark.operators.genstore import (  # noqa: F401
    GenerationalStore,
    _is_file_vanished,
    _UNSET,
)


def _words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    )


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, doc_id, tf) — term frequency per document."""
    return (
        _words(docs, id_col, text_col)
        .groupBy("word", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl) token counts — array-local, no shuffle."""
    return docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("dl"),
    )


class PostingsIndex(GenerationalStore):
    """Build-once persisted posting lists, range-clustered on word,
    with the GENERATION-POINTER durability and segment/tombstone
    lifecycle of operators/genstore.GenerationalStore (the machinery
    was built here across r8-r13 and extracted in r14 so IvfIndex
    shares it).

    Layout: current -> gen-<hex>/{postings,doclens,positions,
    blockstats, segments/<name>/..., tombstones/t-<hex>/}. Stores are
    repartitionByRange(word)-clustered so a term scan prunes to ~1
    file per generation/segment."""

    _STORES = ("postings", "doclens", "positions", "blockstats")
    # Every store is written flat (repartitionByRange + plain parquet,
    # never partitionBy) by build/add_segment/compact alike → eligible
    # for the one-scan multi-path read (genstore._read_flat_store).
    _FLAT_STORES = frozenset(_STORES)
    # Segment validity is judged on the CORE stores only: a pre-r13
    # segment has no blockstats, and silently dropping it from reads
    # would be data loss (review r13). Legacy segments are served
    # (blockmax falls back via corpus_stats=None) and the next
    # compaction rebuilds them in the current format.
    _CORE_STORES = ("postings", "doclens", "positions")

    # Build-time doc-id blocking for block-max pruning (VERDICT r12
    # #2): block = doc_id // block_width, width chosen at build time so
    # a block holds ~_BLOCK_DOCS documents (width scales with the id
    # span over the doc count, so sparse id spaces still get ~32-doc
    # blocks). SMALL blocks are the point — a block spanning 10⁵ docs
    # has saturated max_tf/min_dl and prunes nothing (measured on the
    # sf1 fixture with 256 corpus-spanning blocks: 0 blocks pruned);
    # ~32-doc blocks make the bounds vary, which is what block-max
    # exploits. The width is FROZEN in generation meta — segments
    # added later may mint block ids beyond the initial span, which is
    # fine: stats rows are per (word, block) and serving never assumes
    # a block count.
    _BLOCK_DOCS = 32

    # Scale-adaptive segment file sizing (r15): one file per this many
    # docs per store, capped by the caller's n_files — micro-batches
    # land single-file stores, bulk adds spread. ~32k docs of the
    # fixture's ~50-word documents is a few MB of postings per file.
    _SEG_DOCS_PER_FILE = 32_768

    _META_DEFAULT = {"id_col": "doc_id", "text_col": "text"}

    @staticmethod
    def _write_meta(
        gen_dir: str,
        id_col: str,
        text_col: str,
        block_width: int,
        impact: bool = False,
    ) -> None:
        import json

        os.makedirs(gen_dir, exist_ok=True)
        with open(os.path.join(gen_dir, "_meta.json"), "w") as f:
            json.dump(
                {
                    "id_col": id_col,
                    "text_col": text_col,
                    "block_width": block_width,
                    "impact_blocked": bool(impact),
                },
                f,
            )

    # -- impact-ordered blocking (VERDICT r13 #1) -----------------------
    # Block-max pruning only pays when per-block bounds VARY; on a
    # corpus whose doc ids are uncorrelated with score potential, every
    # block holds a mix of short and long docs and the maxima saturate.
    # The standard IR fix is doc-id reassignment by a static impact
    # proxy (shorter doc => higher BM25 potential). Rewriting user ids
    # would break every downstream join, so instead the index mints a
    # separate BLOCK id: docs sorted by dl ascending are chunked into
    # ~_BLOCK_DOCS-doc blocks, stores are range-clustered on blk, and
    # serving's range predicates push down on blk instead of doc_id.
    # Query results are unchanged (doc ids untouched) — only the
    # physical kept/pruned geometry improves.

    @staticmethod
    def _impact_offsets(docstats: DataFrame) -> DataFrame:
        """(maxtf, dl, cnt, off): counts per (maxtf, dl) key with
        exclusive prefix offsets — the cumulative position of each key
        run in the impact ordering maxtf DESC, dl ASC. maxtf leads
        because repetition is what BM25 rewards most (a doc's best
        term score is monotone in tf and saturates; measured on the
        fixture: the top-15 docs all carry tf 3–9 while dl spans the
        whole 10–99 range), dl breaks ties the right way. The window
        runs over the AGGREGATED histogram ((maxtf, dl) domain —
        metadata-sized, never corpus-sized), so the single-partition
        sort is bounded."""
        hist = docstats.groupBy("maxtf", "dl").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = Window.orderBy(F.desc("maxtf"), F.asc("dl")).rowsBetween(
            Window.unboundedPreceding, -1
        )
        return hist.withColumn(
            "off", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
        )

    @staticmethod
    def _with_impact_blk(
        df: DataFrame, id_col: str, offs: DataFrame, blk_base: int = 0
    ) -> DataFrame:
        """blk = blk_base + (off_key + doc_id mod cnt_key) //
        _BLOCK_DOCS, key = (maxtf, dl). The mod spreads a key run's
        docs across its own block span without any corpus-sized window
        or renumber shuffle, and — deliberately — uses plain
        non-negative modulo instead of a hash so a SQL oracle
        reproduces the assignment bit-for-bit (DuckDB has no
        xxhash64). Blocks may straddle adjacent keys and sizes are
        ~Poisson around _BLOCK_DOCS; both only perturb pruning
        efficiency — bounds stay exact because they aggregate actual
        members. Requires non-negative ids (mod portability),
        enforced at build/ingest."""
        cols = list(df.columns)  # the join keys reorder; restore
        return (
            df.join(F.broadcast(offs), ["maxtf", "dl"])
            .withColumn(
                "blk",
                (
                    F.lit(int(blk_base))
                    + F.floor(
                        (
                            F.col("off")
                            + F.pmod(F.col(id_col), F.col("cnt"))
                        )
                        / PostingsIndex._BLOCK_DOCS
                    )
                ).cast("long"),
            )
            .select(*cols, "blk")
        )

    @staticmethod
    def _write_empty_stores(
        docs: DataFrame,
        out: str,
        id_col: str,
        impact: bool,
    ) -> None:
        """Schema-bearing zero-row stores for the empty bootstrap
        build — column names, order and types identical to what
        _write_stores emits (the id column's type comes from the
        input frame; everything derived is the pipeline's BIGINT
        casts, positions' pos is posexplode's INT)."""
        from pyspark.sql import types as T

        from batch_processing_etl_orchestration_spark.tables import empty_df

        spark = docs.sparkSession
        id_t = docs.schema[id_col].dataType
        big = T.LongType()

        def _w(store: str, fields) -> None:
            # JVM-only empty frame (tables.empty_df): one trivial Range
            # task guaranteed to emit a schema-bearing parquet file —
            # createDataFrame([], ...) would plan a 32-slice Python RDD
            # whose coalesce(1) write evaluates every slice
            # sequentially through Python workers (measured ~5-7 s per
            # store on local[32])
            (
                empty_df(
                    spark,
                    T.StructType([T.StructField(c, t) for c, t in fields]),
                )
                .write.mode("errorifexists")
                .parquet(os.path.join(out, store))
            )

        _w(
            "positions",
            [("word", T.StringType()), (id_col, id_t), ("pos", T.IntegerType())],
        )
        _w(
            "postings",
            [("word", T.StringType()), (id_col, id_t), ("tf", big), ("dl", big)]
            + ([("blk", big)] if impact else []),
        )
        _w(
            "doclens",
            [(id_col, id_t), ("dl", big)]
            + ([("maxtf", big), ("blk", big)] if impact else []),
        )
        _w(
            "blockstats",
            [
                ("word", T.StringType()),
                ("blk", big),
                ("max_tf", big),
                ("min_dl", big),
                ("df_blk", big),
            ],
        )
        PostingsIndex._dump_corpus_json(out, 0, 0, None)

    @staticmethod
    def _write_stores(
        docs: DataFrame,
        out: str,
        n_files: int,
        id_col: str,
        text_col: str,
        block_width: int,
        impact: bool = False,
        blk_base: int = 0,
    ) -> None:
        # postings carry the doc length DENORMALIZED (word, doc_id,
        # tf, dl) — the impact-ordered-index trick: BM25 serving needs
        # dl per posting, and embedding it kills the doclens shuffle
        # join on the read path (at 10⁸ posting rows that join IS the
        # serving cost). +8 bytes/posting at build time, paid once.
        # SMALL row groups (2 MB vs the 128 MB default): a range-
        # clustered file is often one giant row group, which makes the
        # footer-stats doc_id pruning block-max serving relies on a
        # no-op (measured: the seed scan read entire hot-term files).
        # A hot term spanning many small row groups gets narrow id
        # windows per group — that's what the seed/kept range
        # predicates skip. Term lookups only get finer pruning.
        # ONE tokenize pass per build/ingest (r15 optimization, guide
        # §2.3/§8: never scan the heavy opaque column twice when a
        # lightweight derived table answers the question). The
        # positional store carries EVERY token, so it is written FIRST
        # and the other stores derive from its read-back: tf = rows
        # per (word, doc), dl = Σ tf per doc (every token counted
        # once — identical to size(split)), maxtf = max tf per doc.
        # The old shape ran the text split three times (tf pass, dl
        # pass, positions pass) plus two eager checkpoints; the new
        # one scans raw text once and every derived pass is a
        # column-pruned scan of the written (word, id[, pos]) parquet.
        # Impact mode still writes doclens before postings —
        # (doc_id, dl, maxtf, blk), blk from the (maxtf DESC, dl ASC)
        # impact ordering — and reads it back for the postings join,
        # so both stores carry the identical doc→block assignment.
        # Both stores cluster on blk so the kept/seed BLK ranges (not
        # doc-id ranges) reach the footers.
        # Read-backs below pass the WRITTEN frame's schema explicitly
        # (r16 optimization): a bare spark.read.parquet runs a
        # footer-reading schema-inference job per call (~0.1 s fixed
        # overhead locally), and a landing paid four of them — with
        # the schema known at write time they cost zero jobs.
        spark = docs.sparkSession
        pos_df = build_positional_postings(docs, id_col, text_col)
        (
            pos_df
            .repartitionByRange(n_files, "word")
            .sortWithinPartitions("word", id_col, "pos")
            .write.mode("errorifexists")
            .parquet(os.path.join(out, "positions"))
        )
        tf_tbl = (
            spark.read.schema(pos_df.schema)
            .parquet(os.path.join(out, "positions"))
            .groupBy("word", id_col)
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        stats = tf_tbl.groupBy(id_col).agg(
            F.sum("tf").cast("long").alias("dl"),
            F.max("tf").cast("long").alias("maxtf"),
        )
        if impact:
            # The (maxtf, dl) histogram is broadcast-sized by contract
            # (see _impact_offsets) — collect it ONCE and compute the
            # exclusive prefix offsets with exact integer arithmetic
            # on the driver: the offsets frame becomes a literal
            # (no recompute per reference), and the corpus totals
            # (n_docs = Σ cnt, total_dl = Σ dl·cnt) fall out for FREE,
            # so the impact path skips the separate doclens read-back
            # aggregation _write_corpus_stats would run. The max doc
            # id (the _land_segment append-only watermark) rides the
            # doclens WRITE as an observed metric — same job, no
            # extra pass (r15 optimization).
            from pyspark.sql import Observation

            hist = (
                stats.groupBy("maxtf", "dl")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            )
            hist.sort(key=lambda r: (-r["maxtf"], r["dl"]))
            offs_rows, run = [], 0
            for r in hist:
                offs_rows.append(
                    (int(r["maxtf"]), int(r["dl"]), int(r["cnt"]), run)
                )
                run += int(r["cnt"])
            from batch_processing_etl_orchestration_spark.tables import (
                local_rows_df,
            )

            # Arrow LocalRelation, not a Python-RDD literal (r15): the
            # offsets frame is broadcast into BOTH store writes below,
            # and each broadcast of a list-backed frame re-runs its
            # 32-slice Python scan (~0.5 s per action on local[32])
            offs = local_rows_df(
                spark, offs_rows, "maxtf BIGINT, dl BIGINT, cnt BIGINT, off BIGINT"
            )
            obs = Observation()
            dl_df = PostingsIndex._with_impact_blk(
                stats.select(id_col, "dl", "maxtf"), id_col, offs,
                blk_base,
            ).select(id_col, "dl", "maxtf", "blk")
            (
                dl_df
                .repartitionByRange(max(1, n_files // 4), "blk")
                .sortWithinPartitions("blk", id_col)
                # observe sits ABOVE the repartition: range partitioning
                # runs a sampling pass over its child, and a metrics
                # node below it fires once per pass (measured: count
                # doubles; max is idempotent but keep both placements
                # consistent)
                .observe(
                    obs,
                    F.max(F.col(id_col)).alias("hi"),
                    F.min(F.col(id_col)).alias("lo"),
                )
                .write.mode("errorifexists")
                .parquet(os.path.join(out, "doclens"))
            )
            id_hi, id_lo = obs.get["hi"], obs.get["lo"]
            dls = (
                spark.read.schema(dl_df.schema)
                .parquet(os.path.join(out, "doclens"))
                .select(id_col, "dl", "blk")
            )
        else:
            dls = stats.select(id_col, "dl")
        post_df = tf_tbl.join(dls, id_col).select(
            "word", id_col, "tf", "dl",
            *(("blk",) if impact else ()),
        )
        (
            post_df
            .repartitionByRange(n_files, "word")
            .sortWithinPartitions(
                *(
                    ("word", "blk", id_col)
                    if impact
                    else ("word", id_col)
                )
            )
            .write.mode("errorifexists")
            .option("parquet.block.size", str(2 * 1024 * 1024))
            .parquet(os.path.join(out, "postings"))
        )
        if not impact:
            # doclens clustered on the id so doc-id range predicates
            # reach the parquet footers. Corpus stats (n_docs,
            # total_dl) and the max-id watermark ride the SAME write
            # as observed metrics — the separate read-back aggregation
            # _write_corpus_stats ran per build/ingest is gone (r15
            # optimization: one fewer action per micro-batch landing).
            from pyspark.sql import Observation

            obs = Observation()
            (
                dls.repartitionByRange(max(1, n_files // 4), id_col)
                .sortWithinPartitions(id_col)
                # observe sits ABOVE the repartition: range partitioning
                # runs a sampling pass over its child, and a metrics
                # node below it fires once per pass — the count comes
                # out DOUBLED (measured on this Spark)
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("n"),
                    F.sum("dl").alias("t"),
                    F.max(F.col(id_col)).alias("hi"),
                    F.min(F.col(id_col)).alias("lo"),
                )
                .write.mode("errorifexists")
                .parquet(os.path.join(out, "doclens"))
            )
            m = obs.get
            PostingsIndex._dump_corpus_json(
                out, int(m["n"] or 0), int(m["t"] or 0), m["hi"], m["lo"]
            )
        # blockstats read BACK the just-written parquet instead of
        # recomputing the join pipeline (review r13); postings already
        # embed dl (and blk in impact mode). Schemas passed explicitly
        # — they ARE the just-written frames' schemas (r16: no
        # inference jobs).
        dl_schema = dl_df.schema if impact else dls.schema
        PostingsIndex._write_blockstats(
            spark.read.schema(post_df.schema).parquet(
                os.path.join(out, "postings")
            ),
            spark.read.schema(dl_schema).parquet(
                os.path.join(out, "doclens")
            ),
            out,
            id_col,
            block_width,
            n_files,
        )
        if impact:
            PostingsIndex._dump_corpus_json(
                out,
                sum(c for _, _, c, _ in offs_rows),
                sum(d * c for _, d, c, _ in offs_rows),
                id_hi,
                id_lo,
            )

    @staticmethod
    def _dump_corpus_json(out, n_docs, total_dl, id_hi, id_lo=None) -> None:
        """The per-store stats sidecar: (n_docs, total_dl) are BM25's
        corpus constants — index metadata summed at read time instead
        of a per-query doclens aggregation — and [id_lo, id_hi] is the
        store's doc-id span: id_hi alone is the _land_segment
        append-only watermark, the pair is the r16 interval-pruning
        hint (genstore._live_id_intervals). Omitted when unknown;
        readers then fall back to the disjointness scan."""
        import json

        st = {"n_docs": int(n_docs), "total_dl": int(total_dl)}
        if id_hi is not None:
            st["id_hi"] = int(id_hi)
        if id_lo is not None:
            st["id_lo"] = int(id_lo)
        with open(os.path.join(out, "_corpus.json"), "w") as f:
            json.dump(st, f)

    @staticmethod
    def _write_corpus_stats(doclens: DataFrame, out: str, id_col=None) -> None:
        """Aggregate-and-persist form of _dump_corpus_json, for
        callers holding a finished doclens store (compaction). With
        `id_col` the store's max id rides the same tiny aggregation
        as the watermark."""
        row = doclens.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("t"),
            *(
                (
                    F.max(F.col(id_col)).alias("hi"),
                    F.min(F.col(id_col)).alias("lo"),
                )
                if id_col
                else ()
            ),
        ).first()
        PostingsIndex._dump_corpus_json(
            out,
            int(row["n"] or 0),
            int(row["t"] or 0),
            row["hi"] if id_col else None,
            row["lo"] if id_col else None,
        )

    @staticmethod
    def _write_blockstats(
        postings: DataFrame,
        doclens: DataFrame,
        out: str,
        id_col: str,
        block_width: int,
        n_files: int,
    ) -> None:
        """Per (word, block) pruning bounds for block-max serving
        (bm25_topk_blockmax): max_tf / min_dl bound any BM25 impact in
        the block for ANY (k1, b, avgdl) — the tf-normalized term score
        increases in tf and decreases in dl — and df_blk counts posting
        rows (Σ over blocks = the term's df while no tombstones exist).
        Row count is Σ_w min(df_w, n_blocks): a compressed summary,
        never posting-sized for hot terms."""
        if "dl" not in postings.columns:
            postings = postings.join(doclens, id_col)
        blk = (
            F.col("blk")  # impact-blocked store: assignment is baked in
            if "blk" in postings.columns
            else F.floor(F.col(id_col) / F.lit(block_width))
        )
        (
            postings.select(
                "word",
                blk.cast("long").alias("blk"),
                "tf",
                "dl",
            )
            .groupBy("word", "blk")
            .agg(
                F.max("tf").cast("long").alias("max_tf"),
                F.min("dl").cast("long").alias("min_dl"),
                F.count(F.lit(1)).cast("long").alias("df_blk"),
            )
            .repartitionByRange(max(1, n_files // 2), "word")
            .sortWithinPartitions("word", "blk")
            .write.mode("errorifexists")
            .parquet(os.path.join(out, "blockstats"))
        )

    @staticmethod
    def build(
        spark: SparkSession,
        docs: DataFrame,
        path: str,
        n_files: int = 16,
        id_col: str = "doc_id",
        text_col: str = "text",
        impact_ordered: bool = False,
    ) -> "PostingsIndex":
        """`impact_ordered=True` assigns block ids by static impact
        (max term frequency DESC, doc length ASC — see
        _with_impact_blk) instead of by doc-id range: same results,
        same stores plus a blk column, but per-block bounds VARY so
        block-max serving actually skips blocks — the
        doc-id-reassignment lever every production IR engine pulls,
        minus the id rewrite."""
        os.makedirs(path, exist_ok=True)
        # freeze the block width off the initial id span and doc count
        # (one tiny agg action at build time; build is already a full
        # corpus pass): ~_BLOCK_DOCS docs per block even when ids are
        # sparse (width = span × 32 / n_docs, floor, min 1)
        row = docs.agg(
            F.max(F.col(id_col)).alias("hi"),
            F.min(F.col(id_col)).alias("lo"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        hi, n = int(row["hi"] or 0), int(row["n"] or 0)
        if impact_ordered and row["lo"] is not None and int(row["lo"]) < 0:
            raise ValueError(
                "impact_ordered build requires non-negative doc ids "
                "(the block assignment's modulo must be SQL-portable)"
            )
        block_width = (
            PostingsIndex._BLOCK_DOCS
            if impact_ordered  # nominal docs/block; blk is stored
            else max(1, (hi + 1) * PostingsIndex._BLOCK_DOCS // max(1, n))
        )
        gen_name = f"gen-{uuid.uuid4().hex[:12]}"
        gen_dir = os.path.join(path, gen_name)
        if n == 0:
            # Bootstrap fast path (r15 optimization): a brand-new
            # streaming ingest builds its index EMPTY, and the full
            # pipeline is ~5 shuffle-planned actions (plus the impact
            # histogram collect) to produce zero rows. Write the four
            # schema-bearing empty stores directly — same schemas the
            # pipeline would emit, pinned by
            # tests/test_retrieval.py::test_empty_build_fast_path.
            PostingsIndex._write_empty_stores(
                docs, gen_dir, id_col, impact_ordered
            )
        else:
            PostingsIndex._write_stores(
                docs, gen_dir, n_files, id_col, text_col, block_width,
                impact=impact_ordered,
            )
        PostingsIndex._write_meta(
            gen_dir, id_col, text_col, block_width, impact=impact_ordered
        )
        idx = PostingsIndex(spark, path)
        # a rebuild over a live index carries the committed-segments
        # ledger forward (review r15 — see _write_rebuild_manifest)
        idx._write_rebuild_manifest(gen_dir)
        idx._publish(gen_name)  # readers never see a half-built index
        return idx

    # -- segments: incremental maintenance (the Lucene model) ----------
    # New document batches land as SEGMENTS — self-contained stores
    # under <gen>/segments/<name>/ — so ingestion never rewrites the
    # base index. Readers union base + segments; compact_segments
    # folds everything into a fresh generation (Lucene's merge).

    def add_segment(
        self,
        docs: DataFrame,
        name: str,
        n_files: int = 4,
        id_col: str | None = None,
        text_col: str | None = None,
    ) -> None:
        """Index a NEW batch of documents as a segment. Doc ids must
        be new — ENFORCED (review r14): an id already live in the base
        or another segment would double-count tf and, worse, make the
        two serving paths disagree on df (bm25_topk counts distinct
        doc ids; blockstats sums per-block posting rows), silently
        breaking the pruned path's hash parity. The check range-prunes
        live doclens by the batch's [min, max] id bounds, so the
        common append-only ingest (fresh ids past the base max) skips
        every row group via parquet stats. Within-batch duplicate ids
        are rejected by the same single bounds job. (Two CONCURRENT
        adds carrying the same id can still slip the check — each
        reads a doclens view excluding the other; segment-name
        collision is the only defense there.)
        Ids currently tombstoned are rejected — compact first, or the
        new version would be silently hidden by the bitmap. The
        segment builds under a _tmp- name and RENAMES into place, so
        a crashed attempt leaves only an ignored temp dir and the
        same name can be retried; a duplicate name fails the rename.

        id_col/text_col default to the columns the index was BUILT
        with (generation meta); passing different ones is rejected —
        mixed-column stores would break every union read."""
        meta = self._meta()
        for given, key in ((id_col, "id_col"), (text_col, "text_col")):
            if given is not None and given != meta[key]:
                raise ValueError(
                    f"add_segment: {key}={given!r} does not match the "
                    f"index's {meta[key]!r}"
                )
        if "block_width" not in meta:
            # pre-r13 layout: base postings lack the denormalized dl
            # column and blockstats/corpus metadata — a segment in the
            # new format would break every union read with a schema
            # mismatch (review r13). Refuse loudly; compact_segments
            # upgrades the generation in place.
            raise ValueError(
                "add_segment: index uses a pre-blockstats layout; run "
                "compact_segments() (which rebuilds the stores in the "
                "current format) or rebuild the index first"
            )
        id_col, text_col = meta["id_col"], meta["text_col"]
        impact = bool(meta.get("impact_blocked"))

        def _validate(bounds, gen0):
            if (
                impact
                and bounds["lo"] is not None
                and int(bounds["lo"]) < 0
            ):
                raise ValueError(
                    "add_segment: impact-blocked index requires "
                    "non-negative doc ids (SQL-portable modulo)"
                )

        def _write(tmp, gen0, bounds):
            # the FROZEN build-time width keeps the doc→block mapping
            # consistent across base + segments (block-max pruning
            # relies on a doc occupying ONE block for every term it
            # contains). Impact mode instead mints the segment its own
            # DISJOINT blk range (base = Σ prior stores' block spans):
            # a segment's impact ordering is local, and stats
            # re-aggregate per (word, blk) anyway, so disjointness is
            # an efficiency choice — two adds racing to the same base
            # would only merge bounds, never break exactness.
            # Compaction re-blocks globally.
            # File count scales with the BATCH (r15 optimization,
            # guide §6): `n_files` is the cap, the actual count grows
            # one file per _SEG_DOCS_PER_FILE docs — a micro-batch
            # lands 1 file per store instead of a fixed fan-out of
            # near-empty files (which every later union read pays to
            # list and open), while a bulk backfill still spreads.
            eff_files = max(
                1,
                min(
                    n_files,
                    -(-int(bounds["n"]) // PostingsIndex._SEG_DOCS_PER_FILE),
                ),
            )
            self._write_stores(
                docs, tmp, eff_files, id_col, text_col,
                int(meta.get("block_width", 1)),
                impact=impact,
                blk_base=(
                    self._impact_blk_base(gen0) if impact else 0
                ),
            )

        self._land_segment(
            docs.select(F.col(id_col)), name, _write, validate=_validate
        )

    def _live_ids(self, gen: str, dirs: list[str] | None = None) -> DataFrame:
        """Ids currently served (doclens is the per-doc store; reads
        apply the tombstone anti-join) — the add-segment disjointness
        view, range-prunable on the id-clustered store. `dirs`
        restricts the scan to the given store dirs (the sidecar
        interval-pruned set, r16); the tombstone anti-join is applied
        either way so a tombstoned id still reports as tombstoned
        downstream, never as a live conflict."""
        id_col = self._meta(gen)["id_col"]
        if dirs is None:
            return self.doclens(gen).select(id_col)
        df = self._read_flat_store(
            "doclens", [os.path.join(d, "doclens") for d in dirs]
        )
        dead = self._tombstones(gen)
        if dead is not None:
            df = df.join(F.broadcast(dead), id_col, "left_anti")
        return df.select(id_col)

    def _live_count_hint(self, gen: str) -> int | None:
        """Σ `_corpus.json` n_docs over base + segments — sidecar
        metadata only, no Spark job (r15: lets the empty-bootstrap
        ingest skip the disjointness scan). None when any store lacks
        the sidecar (legacy layout — stay conservative)."""
        import json

        total = 0
        for d in [gen] + self._segment_dirs(gen):
            try:
                with open(os.path.join(d, "_corpus.json")) as f:
                    total += int(json.load(f)["n_docs"])
            except (OSError, ValueError, KeyError):
                return None
        return total

    def _live_id_hi_hint(self, gen: str) -> int | None:
        """Max `_corpus.json` id_hi over base + segments — the
        append-only watermark _land_segment's fast path checks
        (sidecar metadata only, no Spark job; r15 optimization).
        Empty stores (n_docs == 0) contribute nothing; a non-empty
        store without the key (pre-watermark layout) makes the
        answer unknown — stay conservative and scan."""
        import json

        hi = None
        for d in [gen] + self._segment_dirs(gen):
            try:
                with open(os.path.join(d, "_corpus.json")) as f:
                    st = json.load(f)
                if int(st["n_docs"]) == 0:
                    continue
                h = int(st["id_hi"])
            except (OSError, ValueError, KeyError, TypeError):
                return None
            hi = h if hi is None else max(hi, h)
        return hi

    def _impact_blk_base(self, gen: str) -> int:
        """First free block id for a NEW segment on an impact-blocked
        index: Σ over existing stores of their worst-case block span
        (n_docs // _BLOCK_DOCS + 1 — a store's local blk ids live in
        [blk_base, blk_base + span)). Reads the same _corpus.json
        sidecars corpus_stats does; a store missing one contributes 0
        (cannot happen on impact-blocked generations, which always
        carry corpus metadata)."""
        import json

        base = 0
        for d in [gen] + self._segment_dirs(gen):
            try:
                with open(os.path.join(d, "_corpus.json")) as f:
                    n = int(json.load(f)["n_docs"])
            except (OSError, ValueError, KeyError):
                n = 0
            base += n // self._BLOCK_DOCS + 1
        return base

    def _compact_once(self, n_files: int = 16) -> int:
        gen = self._gen()  # one consistent view across all three stores
        segs = self._segment_dirs(gen)
        tomb_dirs = self._tombstone_dirs(gen)
        dead = (
            self.spark.read.parquet(*tomb_dirs).distinct()
            if tomb_dirs
            else None
        )
        if not segs and dead is None:
            return 0
        meta = self._meta(gen)
        id_col = meta["id_col"]
        gen_name = f"gen-{uuid.uuid4().hex[:12]}"
        out = os.path.join(self.path, gen_name)
        block_width = meta.get("block_width")
        impact = bool(meta.get("impact_blocked"))
        offs = None
        if impact:
            # fresh GLOBAL impact blocking over the folded corpus:
            # per-store blk ranges (base + offset segments) collapse
            # back to one dense impact-ordered block space. offs is
            # histogram-sized; eager-checkpoint it so the store folds
            # don't re-evaluate the corpus-wide groupBy each (the r13
            # lazy-reuse lesson). doclens folds FIRST (the loop order
            # below) and postings read its fresh blk back by id —
            # same single-assignment discipline as _write_stores.
            offs = self._impact_offsets(
                self._union_store(
                    "doclens", segs=segs, dead=dead, gen=gen
                ).drop("blk")
            ).localCheckpoint(eager=True)
        try:
            for store, sort_cols in (
                ("doclens", [id_col]),
                ("postings", ["word", id_col]),
                ("positions", ["word", id_col, "pos"]),
            ):
                # one segment listing + one tombstone read for all
                # three stores — also pins a single consistent view
                merged = self._union_store(
                    store, segs=segs, dead=dead, gen=gen
                )
                if impact and "blk" in merged.columns:
                    merged = merged.drop("blk")
                if store == "postings" and "dl" not in merged.columns:
                    # legacy 3-column postings: denormalize dl during
                    # the fold so the compacted generation serves the
                    # current format (review r13)
                    merged = merged.join(
                        self._union_store(
                            "doclens", segs=segs, dead=dead, gen=gen
                        ).select(id_col, "dl"),
                        id_col,
                    ).select("word", id_col, "tf", "dl")
                if impact and store == "doclens":
                    merged = self._with_impact_blk(merged, id_col, offs)
                if impact and store == "postings":
                    merged = merged.join(
                        self.spark.read.parquet(
                            os.path.join(out, "doclens")
                        ).select(id_col, "blk"),
                        id_col,
                    ).select("word", id_col, "tf", "dl", "blk")
                if store == "doclens":
                    merged = merged.repartitionByRange(
                        max(1, n_files // 4), "blk" if impact else id_col
                    ).sortWithinPartitions(
                        *(("blk", id_col) if impact else (id_col,))
                    )
                elif sort_cols:
                    merged = merged.repartitionByRange(
                        n_files, "word"
                    ).sortWithinPartitions(
                        *(
                            ["word", "blk", id_col]
                            if impact and store == "postings"
                            else sort_cols
                        )
                    )
                writer = merged.write.mode("errorifexists")
                if store == "postings":
                    # keep the small row groups build() declares
                    # load-bearing for block-max doc-id pruning
                    # (review r13: a compacted generation silently
                    # regressed the pruning to a no-op)
                    writer = writer.option(
                        "parquet.block.size", str(2 * 1024 * 1024)
                    )
                writer.parquet(os.path.join(out, store))
            # blockstats are rebuilt EXACTLY from the merged stores
            # (never merged from per-segment stats): the tombstoned
            # rows are physically gone here, so every compacted
            # generation's bounds and df_blk sums are exact again.
            # The build-time width is frozen — id growth just mints
            # higher block ids; a LEGACY meta without a width gets a
            # fresh one derived from the merged doclens (review r13:
            # defaulting to width=1 minted a posting-sized stats store
            # forever).
            if block_width is None:
                dl_read = self.spark.read.parquet(
                    os.path.join(out, "doclens")
                )
                row = dl_read.agg(
                    F.max(F.col(id_col)).alias("hi"),
                    F.count(F.lit(1)).alias("n"),
                ).first()
                block_width = max(
                    1,
                    (int(row["hi"] or 0) + 1)
                    * PostingsIndex._BLOCK_DOCS
                    // max(1, int(row["n"] or 0)),
                )
            block_width = int(block_width)
            self._write_blockstats(
                self.spark.read.parquet(os.path.join(out, "postings")),
                self.spark.read.parquet(os.path.join(out, "doclens")),
                out,
                id_col,
                block_width,
                n_files,
            )
            self._write_corpus_stats(
                self.spark.read.parquet(os.path.join(out, "doclens")),
                out,
                id_col=id_col,
            )
            self._write_meta(
                out, id_col, meta["text_col"], block_width, impact=impact
            )
            self._write_folded_manifest(out, gen, segs, tomb_dirs)
        except Exception:
            # Never publish a torn generation; reclaim the partial dir.
            # The cleanup covers EVERYTHING up to (but not including)
            # _publish — a failure in _write_meta or the _FOLDED
            # journal write must not leak an unpublished gen-* dir to
            # the 600s age-based reap (ADVICE r9). A concurrent retract
            # renaming a snapshotted segment away mid-read lands here
            # too — compact_segments retries that class once.
            import shutil

            shutil.rmtree(out, ignore_errors=True)
            raise
        self._publish_and_rescue(gen, gen_name, out, segs, tomb_dirs)
        return len(segs)

    def delete_docs(self, doc_ids: DataFrame, id_col: str | None = None) -> None:
        """Tombstone documents — GenerationalStore.delete_ids under the
        index's historical name."""
        self.delete_ids(doc_ids, id_col=id_col)

    def postings(self, gen: str | None = None, segs=None, dead=_UNSET) -> DataFrame:
        return self._union_store("postings", segs=segs, dead=dead, gen=gen)

    def doclens(self, gen: str | None = None, segs=None, dead=_UNSET) -> DataFrame:
        return self._union_store("doclens", segs=segs, dead=dead, gen=gen)

    def positions(self, gen: str | None = None, segs=None, dead=_UNSET) -> DataFrame:
        return self._union_store("positions", segs=segs, dead=dead, gen=gen)

    def has_tombstones(self, gen: str | None = None) -> bool:
        return bool(self._tombstone_dirs(gen))

    def corpus_stats(
        self, gen: str | None = None, segs: list[str] | None = None
    ) -> tuple[int, int] | None:
        """(n_docs, total_dl) summed from the base + segment metadata
        (_corpus.json) — exact while tombstone-free. None when any
        store predates the metadata (legacy generation): callers fall
        back to aggregating doclens. `segs` pins an explicit segment
        snapshot (see _union_store)."""
        import json

        gen = gen or self._gen()
        total_n = total_dl = 0
        for d in [gen] + (self._segment_dirs(gen) if segs is None else segs):
            try:
                with open(os.path.join(d, "_corpus.json")) as f:
                    st = json.load(f)
                total_n += int(st["n_docs"])
                total_dl += int(st["total_dl"])
            except (OSError, ValueError, KeyError):
                return None
        return total_n, total_dl

    def block_width(self) -> int:
        return int(self._meta().get("block_width", 1))

    def blockstats(
        self, gen: str | None = None, segs: list[str] | None = None
    ) -> DataFrame:
        """Union of base + segment block stats, re-aggregated per
        (word, blk). NOT tombstone-adjusted (stats carry no doc ids):
        with live tombstones the maxima/minima remain valid UPPER
        bounds for pruning, but df_blk sums OVERCOUNT df — callers
        needing exact df (bm25_topk_blockmax) must check
        has_tombstones() first. compact_segments rebuilds the stats
        exactly.

        `gen` pins the generation like every other store reader
        (_union_store/corpus_stats/has_tombstones): blockmax_prune_plan
        threads ONE resolved pointer through stats AND the final scan,
        so a delete_docs/compact publishing mid-plan can't make
        df/theta derive from a different committed state than the
        postings scanned (review r14 high); `segs` pins the segment
        snapshot the same way."""
        gen = gen or self._gen()
        df = self.spark.read.parquet(os.path.join(gen, "blockstats"))
        if segs is None:
            segs = self._segment_dirs(gen)
        if not segs:
            # the base store is already unique per (word, blk): skip
            # the re-aggregation so every serving stats job is a bare
            # pruned scan (the common no-segment case)
            return df
        for seg in segs:
            df = df.unionByName(
                self.spark.read.parquet(os.path.join(seg, "blockstats"))
            )
        return df.groupBy("word", "blk").agg(
            F.max("max_tf").alias("max_tf"),
            F.min("min_dl").alias("min_dl"),
            F.sum("df_blk").cast("long").alias("df_blk"),
        )


def search_all_terms(
    postings: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Docs containing EVERY term: (doc_id, total_tf). One pruned scan
    (word IN (...) reaches the parquet footer), one groupBy — the
    k-way posting intersection expressed as a match count."""
    n = len(set(terms))
    return (
        postings.where(F.col("word").isin(list(set(terms))))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_n_matched"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("_n_matched") == n)
        .select(id_col, "total_tf")
    )


def _bm25_per_doc(
    hits: DataFrame,
    doclens: DataFrame,
    dfreq: DataFrame,
    consts: DataFrame,
    k1: float,
    b: float,
    id_col: str,
    round_to: int,
    posting_filter=None,
) -> DataFrame:
    """Shared Okapi scoring tree: (doc_id, n_terms_matched, score),
    unordered. BOTH serving paths (full-scan bm25_topk and block-max
    bm25_topk_blockmax) route through this ONE expression tree so the
    pruned path is hash-identical to the unpruned one by construction
    — df/consts arriving as collected integer literals vs in-plan
    aggregates make the same doubles (integer inputs, one division).

    When `hits` already carries a `dl` column (the PostingsIndex
    postings store denormalizes it), the doclens join is skipped —
    same values, one less corpus-sized shuffle.

    `posting_filter` (blockmax serving) is applied AFTER term_score:
    it may drop postings of provably-sub-threshold docs — their
    partial per-doc sums only get SMALLER, so they can never displace
    the top-k (see _posting_bound_keep).

    Per-doc sum via scaled-long (functions/exact.py convention):
    float addition order across a doc's terms must not change the
    hash; term scores are O(10), so 1e9 scaling is far from overflow."""
    scored = _bm25_scored(hits, doclens, dfreq, consts, k1, b, id_col)
    if posting_filter is not None:
        scored = scored.where(posting_filter)
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        F.round(
            F.sum(F.round(F.col("term_score") * 1e9).cast("long")) / 1e9,
            round_to,
        ).alias("score"),
    )


def _bm25_scored(
    hits: DataFrame,
    doclens: DataFrame,
    dfreq: DataFrame,
    consts: DataFrame,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """Per-posting Okapi term scores (the projection before the
    per-doc fold) — shared so the attestation's survivor count uses
    the exact serving expressions."""
    withdl = (
        hits
        if "dl" in hits.columns
        else hits.join(doclens, id_col)
    )
    return (
        withdl.join(F.broadcast(dfreq), "word")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )


def bm25_topk(
    postings: DataFrame,
    doclens: DataFrame,
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    round_to: int = 6,
) -> DataFrame:
    """Top-k docs by BM25 over `terms` (OR semantics — standard BM25).
    Returns (doc_id, n_terms_matched, score) ordered score desc,
    doc_id asc. Scores rounded to `round_to` dp (ln ulp portability).
    Walks every posting of every query term — exact at any index
    state (tombstones included); bm25_topk_blockmax is the pruned
    serving path for tombstone-free PostingsIndex generations."""
    terms = list(set(terms))
    hits = postings.where(F.col("word").isin(terms))

    # corpus constants: one row, broadcast by construction
    consts = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    ).select(
        "n_docs", (F.col("total_dl") / F.col("n_docs")).alias("avgdl")
    )
    # per-term document frequency: ≤ |terms| rows
    dfreq = hits.groupBy("word").agg(
        F.countDistinct(id_col).alias("df")
    )
    return (
        _bm25_per_doc(hits, doclens, dfreq, consts, k1, b, id_col, round_to)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _block_ranges_pred(id_col: str, blocks: list[int], width: int):
    """OR-of-ranges predicate covering `blocks` (consecutive block ids
    merged into one [lo, hi) doc-id range). Plain attribute
    comparisons, so the disjunction reaches the parquet row-group
    footers of the (word, doc_id)-sorted postings and the
    doc_id-clustered doclens. Returns None for an empty block set."""
    runs: list[list[int]] = []
    for blk in sorted(blocks):
        if runs and blk == runs[-1][1]:
            runs[-1][1] = blk + 1
        else:
            runs.append([blk, blk + 1])
    pred = None
    for lo, hi in runs:
        p = (F.col(id_col) >= lo * width) & (F.col(id_col) < hi * width)
        pred = p if pred is None else (pred | p)
    return pred


# Driver-side bounds for block-max serving: the seed window is one
# contiguous span of blocks anchored at the best-bounded block, and
# kept block ids are collected only when few enough that an
# OR-of-ranges predicate beats an unpruned scan. Both are CONSTANTS,
# independent of corpus size. 256 blocks ≈ 8k docs: still a trivial
# seed scan at any sf, and on impact-ordered indexes the wider window
# lifts θ to near the true k-th best (measured at sf1: kept fell
# 886 → 734 of 1563 blocks going 64 → 256; 512 added nothing).
_SEED_WINDOW = 256
# impact-mode seeding (see blockmax_prune_plan): top blocks by bound +
# a strided diversity sample — sizes chosen so the seed scan stays
# ~8k docs, same budget as the classic window
_SEED_TOP = 128
_SEED_STRIDE_N = 128
# impact-mode kept-set cap: the broadcast-join strategy is bounded by
# driver memory (longs), not by predicate codegen, so it can carry two
# orders of magnitude more blocks than the classic range predicate
_KEPT_JOIN_CAP = 1 << 20


def _blk_df(spark: SparkSession, blks: list[int]):
    """Block-id membership frame for the broadcast join. The kept set
    can reach _KEPT_JOIN_CAP ≈ 1M longs on the HOT serving path, and
    a row-of-tuples createDataFrame re-serializes it one Python
    object at a time — the collect+rebuild round-trip, not broadcast
    size, was the sf100 latency cost (ADVICE r14). Ship it as ONE
    Arrow batch instead: a pandas int64 frame with Arrow conversion
    pinned on for the call."""
    import pandas as pd

    pdf = pd.DataFrame({"blk": pd.Series(blks, dtype="int64")})
    key = "spark.sql.execution.arrow.pyspark.enabled"
    # One-way idempotent enable, never restored (review r15): a
    # set/createDataFrame/unset window races concurrent servers in
    # the same session — an interleaved unset silently drops a peer
    # back to the row-at-a-time path (the exact sf100 cost this
    # exists to remove). Leaving Arrow on is semantics-preserving for
    # this int64-only frame and for every other createDataFrame in
    # the package (all literal-list schemas, Arrow-indifferent).
    if spark.conf.get(key, "false") != "true":
        spark.conf.set(key, "true")
    return spark.createDataFrame(pdf)


def _coarse_blk_pred(col: str, blks: list[int]):
    """One [min, max] range over a scattered block set — the part of
    the selection parquet footers can act on; the broadcast join does
    the exact membership."""
    return (F.col(col) >= min(blks)) & (F.col(col) <= max(blks))
_KEPT_CAP = 16384
# Below this corpus size the full posting walk beats block-max's fixed
# plan costs (~5 small driver-coordinated jobs; measured: full scan
# 0.87 s vs blockmax 7.4 s at 5k docs, crossover near 10⁶ docs, 14.5 s
# vs 18.1 s at 5M). Serving switches strategy on the metadata doc
# count — one json read, no Spark job — the same cost-based dispatch
# an optimizer would make.
_BLOCKMAX_MIN_DOCS = 1_000_000


def blockmax_prune_plan(
    index: "PostingsIndex",
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> dict | None:
    """Exact block-max pruning plan (block-max WAND adapted to batch
    serving — VERDICT r12 #2). Returns None when pruning is
    unavailable (live tombstones make stats-derived df inexact, or a
    pre-blockstats generation): callers fall back to the full scan.

    Because blocks are DOC-DETERMINED (blk = doc_id // width for every
    term), a doc's postings for ALL query terms live in its one block,
    so (a) scanning a block set yields COMPLETE scores for its docs and
    (b) a per-block score bound is Σ over terms of the (word, blk)
    impact bound. The plan:

    1. One small job over blockstats (≤ |terms| × n_blocks rows,
       collected — small-by-construction): per-term df (= Σ df_blk,
       exact while tombstone-free) and per-block scaled bound
       ub6(blk) = Σ_t round(idf_t · impact(max_tf, min_dl) · 1e6) —
       computed JVM-side so the attestation oracle reproduces it.
    2. SEED phase: score exactly one CONTIGUOUS _SEED_WINDOW-block
       window anchored at the best-bounded block (~8k docs at 32
       docs/block — trivial at any sf; one narrow doc-id range, so
       parquet row-group stats skip everything else). The anchor
       block tends to contain true top docs, so θ = the k-th best
       seed score lands near the exact k-th best; seed scores are
       true final scores, so θ lower-bounds the k-th best overall.
    3. KEEP blocks with ub6 ≥ θ·1e6 − margin, margin = |terms| + 2:
       covers the Σ-of-rounds vs round-of-Σ slack (≤ |terms|/2), the
       1e9-fold slack in doc scores (< 1), and ulp dust. Every doc
       outside kept blocks provably scores below θ, so the top-k over
       kept blocks equals the full scan's — exactness preserved, the
       oracle unchanged. Serving then adds the per-posting bound
       filter (_posting_bound_keep) inside the kept scan, which
       prunes the shuffle mass even when block bounds are flat.

    Every driver-side collect is BOUNDED regardless of corpus size:
    per-term df (≤ |terms| rows), the seed anchor (TakeOrdered top-1)
    and its ≤ _SEED_WINDOW window rows, the k-row seed top-k, and the
    kept block ids (collected only when
    ≤ _KEPT_CAP — beyond that pruning isn't paying and serving scans
    unpruned, which is always a correct superset). Block bound
    aggregation itself stays distributed.

    The dict carries everything serving AND the attestation query need
    (bound aggregates/seeds/theta/kept), so the report can never
    drift from the rule serving actually ran."""
    terms = sorted(set(terms))
    # Resolve the FULL snapshot ONCE — generation pointer, segment
    # listing, tombstone listing — and thread it through every store/
    # metadata read below AND through serving's final scan
    # (plan["_gen"] / plan["_segs"] / dead=None): a publish racing this
    # plan must never mix two committed states. Pinning the gen alone
    # is not enough (review r14): segment and tombstone dirs mutate IN
    # PLACE under a generation, so a delete_docs or add_segment landing
    # mid-plan would otherwise leak into the scan while the df/theta
    # literals still describe the pre-mutation corpus.
    gen = index._gen()
    meta = index._meta(gen)
    id_col = meta["id_col"]
    width = meta.get("block_width")
    if width is None or index.has_tombstones(gen):
        return None
    width = int(width)
    impact = bool(meta.get("impact_blocked"))
    # impact-blocked stores carry blk as a COLUMN (dl-ordered blocks);
    # classic stores derive it from the id — serving's range predicates
    # target whichever column the stores are clustered on
    pred_col = "blk" if impact else id_col
    pred_width = 1 if impact else width
    segs = index._segment_dirs(gen)
    cst = index.corpus_stats(gen, segs=segs)
    if cst is None:
        # legacy stores without corpus metadata (or a mixed legacy
        # segment): statistics would be unreliable — serve unpruned
        return None
    n_docs, total_dl = cst
    if n_docs == 0:
        return None
    stats = index.blockstats(gen, segs=segs).where(F.col("word").isin(terms))
    dfreq_rows = (
        stats.groupBy("word")
        .agg(
            F.sum("df_blk").cast("long").alias("df"),
            F.max("max_tf").cast("long").alias("maxtf"),
        )
        .collect()  # ≤ |terms| rows
    )
    dfm = {r["word"]: int(r["df"]) for r in dfreq_rows}
    maxtf = {r["word"]: int(r["maxtf"]) for r in dfreq_rows}
    plan = {
        "id_col": id_col,
        "_gen": gen,
        "_segs": segs,
        "width": width,
        "impact": impact,
        "pred_col": pred_col,
        "pred_width": pred_width,
        "n_docs": n_docs,
        "total_dl": total_dl,
        "df": dfm,
        "maxtf": maxtf,
        # margin covers (a) Σ-of-rounds vs round-of-Σ slack ≤ |terms|/2,
        # (b) the 1e9 per-doc fold slack < 1, (c) ulp dust — all at the
        # 1e6 bound scale. When round_to < 6 a doc up to
        # 0.5·10^-round_to BELOW the k-th seed score still TIES it at
        # round_to precision and can win the doc_id tiebreak, so the
        # threshold must slacken by that half-ulp in 1e6 units
        # (review r14: round_to is public on bm25_topk_blockmax).
        "margin": len(terms) + 2
        + (math.ceil(0.5 * 10 ** (6 - round_to)) if round_to < 6 else 0),
        "k": k,
    }
    empty = not dfm  # no term has any posting: fall through far enough
    # to attach an (empty) blocks frame for the attestation, then bail
    avgdl = F.lit(total_dl).cast("double") / F.lit(n_docs).cast("double")
    spark = index.spark
    dfreq_df = _bm25_dfreq_df(spark, dfm)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    ub = (
        idf
        * (F.col("max_tf") * (k1 + 1))
        / (F.col("max_tf") + k1 * (1 - b + b * F.col("min_dl") / avgdl))
    )
    blocks = (
        stats.join(F.broadcast(dfreq_df), "word")
        .withColumn("_ub6", F.round(ub * 1e6).cast("long"))
        .groupBy("blk")
        .agg(
            F.sum("_ub6").alias("ub6"),
            F.sum("df_blk").cast("long").alias("nrows"),
        )
        # Pinned (r15 optimization, guide §2.4/§5): every later stage —
        # impact seeding (top + count + strided), the kept-set collect,
        # serving's kept join, and the attestation's totals — re-derives
        # from this frame, and unpinned each action re-ran the
        # blockstats scan + broadcast join + aggregation from scratch
        # (measured: 6 sequential driver actions ≈ 1.7 s/report at
        # sf0.1). One materialization; the frame is block-count-sized
        # (≤ n_docs/_BLOCK_DOCS rows), the same bound the kept-set
        # broadcast already relies on.
        .localCheckpoint(eager=True)
    )
    # totals deliberately NOT computed here: serving doesn't need
    # them, and every extra stats job costs wall-clock at scale — the
    # attestation query aggregates this lazy frame itself
    plan["_blocks_df"] = blocks
    if empty:
        plan.update(seed_blocks=[], seed_rows=0, theta_scaled=None,
                    kept_blocks=[])
        return plan
    # seed selection — MODE-DEPENDENT (r14):
    #
    # classic (doc-id blocks): ONE CONTIGUOUS window of _SEED_WINDOW
    # blocks anchored at the best-bounded block (top-1 by ub6,
    # TakeOrdered). A contiguous window compiles to a single doc-id
    # range the parquet row-group stats can actually skip — 64
    # SCATTERED top blocks made the seed scan read every hot row group
    # (measured 7.5 s of the sf10 plan) — and doc-id neighbors are an
    # effectively RANDOM doc sample, so θ lands near the true k-th
    # best whenever near-top docs aren't vanishingly rare.
    #
    # impact: the contiguous window FAILS — impact clustering makes
    # blk-neighbors HOMOGENEOUS (the anchor's neighborhood is all
    # high-maxtf/low-dl docs whose bounds are inflated but whose
    # query-term density is ordinary; measured at sf100: window θ
    # 1.47 vs true 2.09, kept 95%, both pruning stages toothless). So
    # the seed is the UNION of the top-_SEED_TOP blocks BY BOUND
    # (catches genuinely skewed corpora: a block's bound dominates
    # every member's score, so true-top blocks rank high) and a
    # _SEED_STRIDE_N-block STRIDED sample across the blk space (the
    # diversity that restores the random-sample behavior). Scattered
    # ranges are cheap HERE because impact stores sort by (word, blk)
    # with small row groups — the classic caveat doesn't apply.
    if impact:
        top_rows = (
            blocks.orderBy(F.desc("ub6"), F.asc("blk"))
            .select("blk", "nrows")
            .limit(_SEED_TOP)
            .collect()
        )
        n_blocks = blocks.count()
        stride = max(1, int(n_blocks) // _SEED_STRIDE_N)
        strided_rows = (
            blocks.where(F.pmod(F.col("blk"), F.lit(stride)) == 0)
            .select("blk", "nrows")
            .collect()  # ≈ blk-span/stride rows — seed-sized
        )
        by_blk = {
            int(r["blk"]): int(r["nrows"])
            for r in list(top_rows) + list(strided_rows)
        }
        seeds = sorted(by_blk)
        plan["seed_blocks"] = seeds
        plan["seed_rows"] = sum(by_blk.values())
    else:
        best = (
            blocks.orderBy(F.desc("ub6"), F.asc("blk"))
            .limit(1)
            .collect()
        )
        b0 = int(best[0]["blk"])
        seed_rows_df = (
            blocks.where(
                (F.col("blk") >= b0) & (F.col("blk") < b0 + _SEED_WINDOW)
            )
            .select("blk", "nrows")
            .collect()  # ≤ _SEED_WINDOW rows
        )
        seeds = sorted(int(r["blk"]) for r in seed_rows_df)
        plan["seed_blocks"] = seeds
        plan["seed_rows"] = sum(int(r["nrows"]) for r in seed_rows_df)
    consts = _bm25_consts_df(spark, n_docs, total_dl)
    seed_hits = index.postings(gen, segs=segs, dead=None).where(
        F.col("word").isin(terms)
    )
    seed_dls = index.doclens(gen, segs=segs, dead=None)
    if impact:
        # SCATTERED block sets select via broadcast JOIN, never an
        # OR-of-ranges predicate: ~250 disjuncts defeat whole-stage
        # codegen and cost 83 s of interpreted filtering at sf100
        # (r14 measurement) where the hash join costs ~nothing. One
        # coarse [min, max] range rides along for parquet footer
        # pruning. The postings embed dl, so seed_dls is never joined
        # on this path — no filter needed there.
        seed_hits = seed_hits.where(
            _coarse_blk_pred(pred_col, seeds)
        ).join(F.broadcast(_blk_df(spark, seeds)), pred_col)
    else:
        pred = _block_ranges_pred(pred_col, seeds, pred_width)
        seed_hits = seed_hits.where(pred)
        seed_dls = seed_dls.where(pred)
    top = (
        _bm25_per_doc(
            seed_hits,
            seed_dls,
            dfreq_df,
            consts,
            k1,
            b,
            id_col,
            round_to,
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .collect()  # ≤ k rows
    )
    if len(top) < k:
        # the seed prefix holds fewer than k docs (tiny corpus, or the
        # _SEED_WINDOW prefix was thinner than the k·|terms| rule
        # expected): no provable threshold — serve unpruned
        plan.update(theta_scaled=None, kept_blocks=None)
        return plan
    theta_scaled = int(round(top[-1]["score"] * 1e6))
    plan["theta_scaled"] = theta_scaled
    # ONE job: collect up to cap+1 kept ids — if the cap overflows,
    # pruning keeps too many blocks to pay for itself and serving
    # scans unpruned (a superset is always exact-safe). Impact mode
    # serves the kept set via broadcast JOIN, which tolerates far
    # larger sets than a range predicate (the cap is a driver-memory
    # bound, ~2 MB of longs, not a codegen bound).
    cap = _KEPT_JOIN_CAP if impact else _KEPT_CAP
    kept_rows = (
        blocks.where(F.col("ub6") >= F.lit(theta_scaled - plan["margin"]))
        .select("blk")
        .limit(cap + 1)
        .collect()
    )
    if len(kept_rows) > cap:
        plan["kept_blocks"] = None
    else:
        plan["kept_blocks"] = sorted(int(r["blk"]) for r in kept_rows)
    return plan


def bm25_topk_blockmax(
    index: "PostingsIndex",
    terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    min_docs: int | None = None,
) -> DataFrame:
    """Block-max BM25 serving over a PostingsIndex: exact top-k (hash-
    identical to bm25_topk — certified by the q_bm25_topk oracle and
    tests/test_retrieval.py) that only scans posting blocks whose
    score bound can reach the seed-phase threshold. Falls back to the
    full-scan path when pruning is unavailable (tombstones, legacy
    generations, empty index). Driver-side work is bounded: one
    blockstats collect (≤ |terms| × n_blocks rows) and one k-row seed
    top-k; the returned DataFrame is the final pruned-scan stage.

    `min_docs` gates the strategy by corpus size (default
    _BLOCKMAX_MIN_DOCS): small indexes serve the plain full walk —
    block-max's fixed plan costs only pay for themselves at scale.
    Pass min_docs=0 to force the pruned path (tests do)."""
    meta = index._meta()
    if min_docs is None:
        min_docs = _BLOCKMAX_MIN_DOCS
    cst = index.corpus_stats()
    if cst is None or cst[0] < min_docs:
        return bm25_topk(
            index.postings(), index.doclens(), terms,
            k=k, k1=k1, b=b, id_col=meta["id_col"], round_to=round_to,
        )
    plan = blockmax_prune_plan(index, terms, k=k, k1=k1, b=b,
                               round_to=round_to)
    if plan is None:
        return bm25_topk(
            index.postings(), index.doclens(), terms,
            k=k, k1=k1, b=b, id_col=meta["id_col"], round_to=round_to,
        )
    terms = sorted(set(terms))
    id_col = plan["id_col"]
    spark = index.spark
    kept = plan["kept_blocks"]
    hits = index.postings(
        plan["_gen"], segs=plan["_segs"], dead=None
    ).where(F.col("word").isin(terms))
    # doclens passes through UNFILTERED: the index postings embed dl,
    # so _bm25_per_doc never joins it on this path
    dls = index.doclens(plan["_gen"], segs=plan["_segs"], dead=None)
    if kept is None or not kept:
        # None: no provable threshold, or too many kept blocks to pay
        # for itself — scan unpruned (exact superset). Empty list:
        # zero candidate postings — the full path returns the same
        # empty result with the right schema. Either way the
        # stats-derived df/consts literals keep the expression tree
        # identical to the pruned branch.
        pass
    elif plan["impact"]:
        # scattered kept blocks: coarse range for the footers +
        # broadcast join for exact membership (see the seed-scan
        # rationale in blockmax_prune_plan)
        hits = hits.where(
            _coarse_blk_pred(plan["pred_col"], kept)
        ).join(F.broadcast(_blk_df(spark, kept)), plan["pred_col"])
    else:
        hits = hits.where(
            _block_ranges_pred(plan["pred_col"], kept, plan["pred_width"])
        )
    # per-posting bound pruning BEFORE the per-doc shuffle — the stage
    # that bites even when block bounds are flat (uniform corpora with
    # dense query terms saturate per-block maxima): only postings that
    # could belong to a ≥θ doc survive into the groupBy
    pfilter = (
        _posting_bound_keep(plan, k1, b)
        if plan["theta_scaled"] is not None
        else None
    )
    return (
        _bm25_per_doc(
            hits,
            dls,
            _bm25_dfreq_df(spark, plan["df"]),
            _bm25_consts_df(spark, plan["n_docs"], plan["total_dl"]),
            k1,
            b,
            id_col,
            round_to,
            posting_filter=pfilter,
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _bm25_consts_df(spark: SparkSession, n_docs: int, total_dl: int):
    """(n_docs, avgdl) from collected exact longs — the division runs
    in-plan on the same integers the in-plan aggregate would produce,
    so the resulting double is bit-identical to bm25_topk's consts."""
    from batch_processing_etl_orchestration_spark.tables import local_rows_df

    return local_rows_df(
        spark, [(n_docs, total_dl)], "n_docs BIGINT, total_dl BIGINT"
    ).select("n_docs", (F.col("total_dl") / F.col("n_docs")).alias("avgdl"))


def _bm25_dfreq_df(spark: SparkSession, dfm: dict[str, int]):
    from batch_processing_etl_orchestration_spark.tables import local_rows_df

    return local_rows_df(
        spark, sorted(dfm.items()), "word STRING, df BIGINT"
    )


def _bound_term6(plan: dict, word: str, k1: float, b: float):
    """round(idf_t · impact(max_tf_t, dl) · 1e6) as a LONG Column over
    the posting's `dl` — term t's maximum possible contribution to any
    doc of that length. df/max_tf/N/total_dl enter as exact integer
    literals, so the doubles (and their 1e6-scaled rounds) match the
    attestation oracle's bit for bit."""
    df_t = plan["df"][word]
    mt = plan["maxtf"][word]
    avgdl = (
        F.lit(plan["total_dl"]).cast("double")
        / F.lit(plan["n_docs"]).cast("double")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(plan["n_docs"]) - F.lit(df_t) + 0.5)
        / (F.lit(df_t) + 0.5)
    )
    e = (
        idf
        * (F.lit(mt) * (k1 + 1))
        / (F.lit(mt) + k1 * (1 - b + b * F.col("dl") / avgdl))
    )
    return F.round(e * 1e6).cast("long")


def _posting_bound_keep(plan: dict, k1: float, b: float):
    """Per-posting pruning predicate for blockmax serving, evaluated
    after term_score: keep iff

      round(term_score·1e6) + Σ_{t'≠t} bound6_{t'}(dl) ≥ θ·1e6 − margin

    i.e. this posting's ACTUAL contribution plus every other term's
    dl-conditional maximum. Safety: for any doc with true score ≥ θ,
    EVERY posting p satisfies ts_p + Σ_{t'≠t_p} bound_{t'} ≥
    Σ_t ts_t = score ≥ θ, so no posting of a top-k doc is dropped and
    its per-doc sum stays exact. A doc that loses postings is provably
    sub-θ; its PARTIAL sum is even smaller, so it can never displace
    the top-k — dropping per-posting (not per-doc) costs nothing and
    needs no cross-posting coordination. Each bound rounds to a scaled
    long before the integer sum (order-free, DuckDB-reproducible);
    the margin is |terms|+2 — Σ-of-rounds vs round-of-Σ slack plus
    fold/ulp dust — PLUS, when round_to < 6, ceil(0.5·10^(6-round_to))
    for the half-ulp at the public rounding precision: a doc up to
    half an ulp below the k-th seed score still TIES it at round_to
    precision and can win the doc_id tiebreak, so θ must slacken by
    that much in 1e6 units (the same margin blockmax_prune_plan
    computes — see its construction). Much tighter than a pure
    doc-level bound: the dominant term's saturated global max_tf is
    replaced by the posting's actual tf."""
    total6 = None
    own6 = None
    for w in sorted(plan["df"]):
        c6 = _bound_term6(plan, w, k1, b)
        total6 = c6 if total6 is None else total6 + c6
        own6 = (
            F.when(F.col("word") == w, c6)
            if own6 is None
            else own6.when(F.col("word") == w, c6)
        )
    own6 = own6.otherwise(F.lit(0).cast("long"))
    chi6 = F.round(F.col("term_score") * 1e6).cast("long") + total6 - own6
    return chi6 >= F.lit(int(plan["theta_scaled"]) - int(plan["margin"]))


def build_positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, doc_id, pos) — one row per OCCURRENCE with its 0-based
    token position; the positional index phrase/proximity queries
    need (tf-only postings can't distinguish "slow hash" from
    "hash slow")."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).select("word", id_col, "pos")


def phrase_search(
    positional: DataFrame, phrase: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Documents containing the EXACT consecutive phrase →
    (doc_id, n_occurrences).

    Plan: the scan keeps only the phrase's terms (an IN filter pushed
    to the range-clustered parquet, ~1 file per term); each surviving
    occurrence maps to the phrase slot(s) its word fills and shifts to
    the phrase's would-be START position (pos - slot); a start where
    ALL k slots check in is a match. Counting DISTINCT slots (not
    rows) makes repeated phrase terms ("the cat the") correct, and
    each distinct start is one occurrence.

    Scale: cost tracks Σ df(term) pruned posting rows, never the
    corpus; the only shuffle is the (doc, start) groupBy. This is the
    classic positional-intersection evaluated as one aggregation
    instead of a k-way merge join — same I/O, planner-native."""
    k = len(phrase)
    slots = F.array(
        *[
            F.struct(F.lit(w).alias("w"), F.lit(i).alias("i"))
            for i, w in enumerate(phrase)
        ]
    )
    expanded = (
        positional.where(F.col("word").isin(list(set(phrase))))
        .select(F.col(id_col), "pos", "word", F.explode(slots).alias("s"))
        .where(F.col("s.w") == F.col("word"))
    )
    matches = (
        expanded.select(
            F.col(id_col),
            (F.col("pos") - F.col("s.i")).alias("start"),
            F.col("s.i").alias("slot"),
        )
        .groupBy(id_col, "start")
        .agg(F.countDistinct("slot").alias("_k"))
        .where(F.col("_k") == k)
    )
    return matches.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )


def proximity_search(
    positional: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents where `term_a` and `term_b` co-occur within `window`
    tokens (unordered) → (doc_id, n_pairs, min_gap). The NEAR/k
    operator search engines pair with exact phrases: same positional
    index, but the position predicate is a band (|pa - pb| ≤ window)
    instead of an exact offset.

    Plan: two pruned term scans join on the document — the position
    band is checked inside the join condition, so the pair blow-up is
    bounded by tf_a × tf_b PER DOCUMENT (occurrence counts, not
    corpus); everything upstream prunes by the word IN filter like
    phrase_search. A per-doc aggregation returns pair counts and the
    closest gap."""
    pa = positional.where(F.col("word") == term_a).select(
        F.col(id_col), F.col("pos").alias("_pa")
    )
    pb = positional.where(F.col("word") == term_b).select(
        F.col(id_col), F.col("pos").alias("_pb")
    )
    # Same-term proximity ("two 'hash' near each other") must pair
    # DISTINCT occurrences once: _pa < _pb kills the zero-gap
    # self-pair and the double-counted orderings that |pa-pb| alone
    # would admit.
    ordered = (
        F.col("_pa") < F.col("_pb")
        if term_a == term_b
        else F.lit(True)
    )
    pairs = pa.join(pb, id_col).where(
        ordered & (F.abs(F.col("_pa") - F.col("_pb")) <= window)
    )
    return pairs.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min(F.abs(F.col("_pa") - F.col("_pb"))).alias("min_gap"),
    )
