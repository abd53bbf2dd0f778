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
      _.select(col(idCol).as("id"), rrfFp(col(rankCol), rrfK).as("fp")))
      .reduce(_ unionAll _)
    tagged.groupBy("id")
      .agg(count(lit(1)).cast("long").as("n_lists"),
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
    // strict left-fold cosine — the same evaluation order as the codegen
    // DotProduct / DuckDB list_reduce, so ⌊cos·10⁶⌋ matches the oracle
    def cos6(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      i = 0
      while (i < a.length) { na += a(i) * a(i); i += 1 }
      i = 0
      while (i < b.length) { nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0L else math.floor(dot / denom * 1e6).toLong
    }
    val lamFp = math.floor(lambda * 1e6).toLong
    val oneMinusFp = math.floor((1.0 - lambda) * 1e6).toLong
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Cand, Long)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands.toSeq: _*)
    while (selected.length < math.min(topK, cands.length)) {
      val scored = remaining.map { c =>
        val maxSim6 =
          if (selected.isEmpty) 0L
          else selected.iterator.map(s => cos6(c.v, s._1.v)).max
        (c, lamFp * c.rel6 - oneMinusFp * maxSim6)
      }
      val best = scored.minBy { case (c, s) => (-s, c.id) }
      selected += ((best._1, best._2))
      remaining -= best._1
    }
    selected.toSeq.zipWithIndex.map { case ((c, s), i) =>
      (c.id, i + 1L, c.rel6.toDouble / 1e6, s.toDouble / 1e12)
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
