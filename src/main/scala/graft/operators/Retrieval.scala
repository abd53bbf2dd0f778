package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: fuse the engine's lexical ranking
  * ([[TextAnalysis.bm25Search]]) with its semantic ranking
  * ([[Similarity]] ANN paths) by reciprocal-rank fusion (RRF,
  * Cormack et al. 2009) — the standard score-free list combiner:
  * `score(d) = Σ_lists 1/(k0 + rank_list(d))`. Rank-based fusion needs
  * no score normalization across heterogeneous retrievers (BM25 µnat
  * sums vs cosine), which is exactly why the reference's search surface
  * (keyword endpoints + `nlp_embeddings.py` MiniLM cosine) composes
  * this way in serving stacks.
  *
  * Determinism contract (driver-hash-stable): each per-list contribution
  * quantizes to `⌊10⁶/(k0+rank)⌋` BIGINTs before the per-doc sum — exact
  * integer arithmetic, order-free under any partitioning — and every
  * output ordering is total (score desc, id).
  *
  * Scale shape: fusion only ever touches the top-`topKEach` rows per
  * list — driver-scale frames regardless of corpus size; the corpus-side
  * cost lives entirely inside the component retrievers, which keep their
  * own audited shapes (BM25's vocabulary-filtered explode; the ANN
  * index's pruned-cell probe). The rank windows run over ≤topKEach rows
  * (single-partition by construction — not a corpus-wide unpartitioned
  * window). */
object Retrieval {

  /** µ-reciprocal-rank fixed-point contribution for one rank column;
    * null rank (absent from that list) contributes 0. */
  private def rrfFp(rank: Column, rrfK: Int): Column =
    coalesce(
      floor(lit(1e6) / (lit(rrfK).cast("double") + rank.cast("double")))
        .cast("long"),
      lit(0L))

  /** Generic N-list RRF fusion. Each input frame must carry `idCol` and
    * `rankCol` (1-based, dense within its list, ≤ some per-list top-k —
    * callers produce these with a `row_number` over their own total
    * ordering). Returns `(id, n_lists, rrf_score)` top `topK`, where
    * `n_lists` counts the lists the id appeared in. Implemented as one
    * union + one keyed agg over the tiny ranked frames — no join chain,
    * so fusing 10 retrievers costs the same shuffle as fusing 2. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
              rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    require(topK > 0, s"topK must be positive, got $topK")
    val tagged = lists.map(
      _.select(col(idCol).as("id"), rrfFp(col(rankCol), rrfK).as("fp"),
        // a null rank means "absent from this list" — it must not count
        // toward n_lists any more than it contributes score
        when(col(rankCol).isNotNull, lit(1)).as("present")))
      .reduce(_ unionAll _)
    tagged.groupBy("id")
      .agg(count(col("present")).cast("long").as("n_lists"),
        sum("fp").as("score_fp"))
      .select(col("id"), col("n_lists"),
        (col("score_fp").cast("double") / 1e6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(topK)
  }

  /** Composed hybrid search: BM25 top-`topKEach` over the document
    * corpus + brute-cosine top-`topKEach` against `queryId`'s embedding,
    * RRF-fused. Returns `(doc_id, lex_rank, sem_rank, rrf_score)` top
    * `topK` — the named rank columns (null = absent from that list) keep
    * the fused ranking explainable. The brute semantic branch is the
    * oracle-exact baseline; at corpus scale swap in
    * [[Similarity.knnIvfPq]] via [[hybridRrf]] with a pre-ranked
    * semantic frame. */
  def hybridSearchRrf(docs: DataFrame, textCol: String, docIdCol: String,
                      emb: DataFrame, vecCol: String, vecIdCol: String,
                      queryTerms: Seq[String], queryId: Long,
                      topKEach: Int = 20, rrfK: Int = 60,
                      topK: Int = 10): DataFrame = {
    require(topKEach > 0, s"topKEach must be positive, got $topKEach")
    val lex = TextAnalysis.bm25Search(docs, textCol, docIdCol, queryTerms,
      topK = topKEach)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("lex_rank"))
    val sem = Similarity.knnBrute(emb, vecCol, vecIdCol, queryId, topKEach)
      .select(col(vecIdCol).as("id"), round(col("cosine"), 6).as("cos6"))
      .withColumn("sem_rank", row_number()
        .over(Window.orderBy(col("cos6").desc, col("id"))).cast("long"))
      .select(col("id"), col("sem_rank"))
    hybridRrf(lex, sem, rrfK, topK)
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) of a
    * retrieval shortlist: greedily pick
    * `argmax λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — relevance
    * traded against redundancy with what's already picked, the standard
    * serve-time diversity pass after [[hybridSearchRrf]] /
    * [[Similarity.knnIvfPq]].
    *
    * `shortlist` must carry `(idCol, relCol, vecCol)` and BE a shortlist:
    * MMR is inherently sequential (each pick changes every remaining
    * score), so the frame is collected and the greedy loop runs on the
    * driver — O(topK·n) dot products over n ≤ `maxShortlist` rows. That
    * is the correct 100-TB shape: the CORPUS-scale work (retrieval) stays
    * distributed; rerank only ever sees the top-n candidates, like the
    * codebook/centroid collects elsewhere in this package. Oversized
    * input fails loudly rather than silently melting the driver.
    *
    * Determinism contract: relevance and pairwise cosines quantize to
    * `⌊·10⁶⌋` BIGINTs, the MMR objective is the exact integer
    * `λ_fp·rel6 − (1−λ)_fp·maxsim6`, ties break on id — so selection
    * order is replayable in SQL (the oracle unrolls the greedy steps the
    * way q_kmeans unrolls Lloyd rounds). The first pick (empty selected
    * set) is pure relevance. Null/mismatched-dim vectors are rejected:
    * a shortlist is small enough to validate eagerly. */
  def mmrRerank(shortlist: DataFrame, idCol: String, relCol: String,
                vecCol: String, lambda: Double = 0.5, topK: Int = 10,
                maxShortlist: Int = 4096): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    require(topK > 0, s"topK must be positive, got $topK")
    val spark = shortlist.sparkSession
    import spark.implicits._
    // a non-integral id would cast to null and surface later as a bare
    // NPE at getLong — reject the contract violation up front, the
    // connectedComponents precedent
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = shortlist.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"mmrRerank: id column '$idCol' is $dt, not an integral type — " +
          "hash or re-key ids upstream")
    }
    val rows = shortlist.select(col(idCol).cast("long").as("id"),
        col(relCol).cast("double").as("rel"),
        Similarity.toDoubleVec(col(vecCol)).as("v"))
      .limit(maxShortlist + 1).collect()
    require(rows.length <= maxShortlist,
      s"mmrRerank input exceeds maxShortlist=$maxShortlist rows — rerank " +
        "operates on a retrieval shortlist, not a corpus; tighten the " +
        "upstream top-k or raise the cap deliberately")
    final case class Cand(id: Long, rel6: Long, v: Array[Double])
    val cands = rows.map { r =>
      require(!r.isNullAt(1), s"null $relCol for id ${r.getLong(0)}")
      require(!r.isNullAt(2), s"null $vecCol for id ${r.getLong(0)}")
      Cand(r.getLong(0), math.floor(r.getDouble(1) * 1e6).toLong,
        r.getSeq[Double](2).toArray)
    }
    cands.headOption.foreach { h =>
      require(cands.forall(_.v.length == h.v.length),
        s"mixed $vecCol dimensions in the shortlist")
    }
    val n = cands.length
    // norms once per candidate (strict left fold, same order as the
    // codegen DotProduct / DuckDB list_reduce)
    val norms = cands.map { c =>
      var s = 0.0; var i = 0
      while (i < c.v.length) { s += c.v(i) * c.v(i); i += 1 }
      math.sqrt(s)
    }
    // ⌊cos·10⁶⌋ between candidates i and j; None when either vector is
    // all-zero — the oracle's NULLIF(denom, 0) makes that cosine NULL,
    // and SQL MAX skips NULLs, so the running max below must too
    def cos6(i: Int, j: Int): Option[Long] = {
      val a = cands(i).v; val b = cands(j).v
      var dot = 0.0; var k = 0
      while (k < a.length) { dot += a(k) * b(k); k += 1 }
      val denom = norms(i) * norms(j)
      if (denom == 0.0) None else Some(math.floor(dot / denom * 1e6).toLong)
    }
    val lamFp = math.floor(lambda * 1e6).toLong
    val oneMinusFp = math.floor((1.0 - lambda) * 1e6).toLong
    // incremental greedy: each candidate keeps a running max-sim against
    // the selected set, updated only against the NEWEST pick — O(topK·n)
    // cosines total, not O(topK²·n). maxSim stays None while every
    // cosine so far was undefined (all-zero vector somewhere): then the
    // MMR score is NULL in the oracle and must sort after every defined
    // score (DuckDB default NULLS LAST), ties on id.
    val maxSim = Array.fill[Option[Long]](n)(None)
    val picked = new Array[Boolean](n)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Option[Long])]
    while (selected.length < math.min(topK, n)) {
      var bestIdx = -1; var bestScore: Option[Long] = None
      var i = 0
      while (i < n) {
        if (!picked(i)) {
          val score: Option[Long] =
            if (selected.isEmpty) Some(lamFp * cands(i).rel6)
            else maxSim(i).map(ms => lamFp * cands(i).rel6 - oneMinusFp * ms)
          val better =
            if (bestIdx < 0) true
            else (score, bestScore) match {
              case (Some(s), Some(bs)) =>
                s > bs || (s == bs && cands(i).id < cands(bestIdx).id)
              case (Some(_), None) => true
              case (None, Some(_)) => false
              case (None, None) => cands(i).id < cands(bestIdx).id
            }
          if (better) { bestIdx = i; bestScore = score }
        }
        i += 1
      }
      picked(bestIdx) = true
      selected += ((bestIdx, bestScore))
      i = 0
      while (i < n) {
        if (!picked(i)) cos6(i, bestIdx).foreach { c =>
          maxSim(i) = Some(maxSim(i).fold(c)(math.max(_, c)))
        }
        i += 1
      }
    }
    selected.toSeq.zipWithIndex.map { case ((idx, s), i) =>
      val c = cands(idx)
      (c.id, i + 1L, c.rel6.toDouble / 1e6, s.map(_.toDouble / 1e12))
    }.toDF("id", "mmr_rank", "rel", "mmr_score")
      .select(col("id").as(idCol), col("mmr_rank"), col("rel"), col("mmr_score"))
  }

  /** Fuse two pre-ranked lists `(id, lex_rank)` / `(id, sem_rank)` into
    * `(doc_id, lex_rank, sem_rank, rrf_score)` — the explainable 2-list
    * shape (a full-outer join keeps both rank columns; [[rrfFuse]] is
    * the N-list generalization when per-list ranks need not survive). */
  def hybridRrf(lex: DataFrame, sem: DataFrame,
                rrfK: Int = 60, topK: Int = 10): DataFrame = {
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    require(topK > 0, s"topK must be positive, got $topK")
    lex.join(sem, Seq("id"), "full_outer")
      .select(col("id").as("doc_id"), col("lex_rank"), col("sem_rank"),
        ((rrfFp(col("lex_rank"), rrfK) + rrfFp(col("sem_rank"), rrfK))
          .cast("double") / 1e6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(topK)
  }
}
