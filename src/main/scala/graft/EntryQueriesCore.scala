package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import scala.collection.immutable.ListMap

import org.apache.spark.sql.expressions.Window

import graft.functions.{HashEmbedder, TextOps, VectorFunctions}
import graft.operators.{Corpus, Dedup, Multimodal, VectorSearch}
import graft.pipeline.Rag

import graft.EntryShared._

/** Scans, aggregation/window/join breadth, dedup + curation + text
  * analysis, RAG, multimodal, formats, and the pure-SQL surface.
  * One segment of SparkEntry's driver-contract board, split out
  * mechanically (order preserved by ListMap concatenation in
  * [[SparkEntry.queries]]).
  */
private[graft] object EntryQueriesCore {
  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    // --- P1/P2 scans & projections (SURVEY §2.2) -------------------------
    "q_scan_project" -> ((s, dir) =>
      t(s, dir, "documents")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    "q_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic data;
        // include l_quantity so ties are identical tuples
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")),

    // --- schemaless -> schema retrofit (SURVEY §1.2) ---------------------
    "q_from_json" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("k",
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))("k"))
        .select("event_id", "event_type", "k")
        .orderBy("event_id")),

    // --- aggregation breadth (SURVEY §2.4 / §7.5.9) ----------------------
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sumCents(col("l_extendedprice")).as("sum_base_price"),
          (sum(round(col("l_extendedprice") * 100) *
            (lit(100) - round(col("l_discount") * 100))) / 10000.0).as("sum_revenue"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // --- dedup: exact (north star) ---------------------------------------
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_chars")
        .orderBy("doc_id")),

    // --- embedding (J1/M1; no oracle — golden/property tests) ------------
    // Array columns crash the driver's pandas loader ("unhashable type:
    // numpy.ndarray", CORRECTNESS_r01) — serialize to JSON for the
    // rows-only check; the raw array form stays in entry()/Rag and specs.
    "q_embed" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          to_json(HashEmbedder.embedCol(col("text"))).as("embedding_json"))
        .orderBy("doc_id")),

    // --- vector top-k, window strategy (J2) -------------------------------
    // Driver-facing projection is (ids, rank) only: rank selection +
    // ordering fully pins the score computation without betting on float
    // bit-parity with the driver's DuckDB build (CORRECTNESS_r01 lesson —
    // rows/ranks matched, raw-double hash didn't). Scores are verified
    // bit-exactly in VectorExprsSpec/VectorSearchSpec.
    "q_vector_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      VectorSearch.topKFlat(queries, "query_id", "qv", emb, "vec_id", "embedding",
        k = 3, metric = "dot")
        .select("query_id", "match_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // --- vector top-k, bounded-heap aggregate strategy (scale path) ------
    // matches is best-first with ties broken by lower id (TopKHeap.better)
    // == the oracle's row_number tie-break, so pos+1 IS the rank.
    "q_vector_topk_agg" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      VectorSearch.topKAgg(queries, "query_id", "qv", emb, "vec_id", "embedding",
        k = 3, metric = "dot")
        .select(col("query_id"), posexplode(col("matches")).as(Seq("pos", "m")))
        .select(col("query_id"), col("m.id").as("match_id"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // --- cosine knn over a query sample ----------------------------------
    "q_knn_cosine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      VectorSearch.topKFlat(queries, "query_id", "qv", emb, "vec_id", "embedding",
        k = 5, metric = "cosine")
        .select("query_id", "match_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // --- FILTERED vector search (exact pre-filter baseline) ---------------
    // Atlas $vectorSearch's `filter` shape: a metadata predicate admits a
    // subset of the corpus and the top-k is exact over the admitted set.
    // This is the oracle-hashed baseline; the index-served strategies
    // (IVF payload pushdown, HNSW over-fetch) contract against the same
    // ground truth below.
    "q_vector_filtered" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      VectorSearch.topKFiltered(annQueries(s, dir), "query_id", "qv",
        emb, "vec_id", "embedding", FilteredPred, k = 3, metric = "dot")
        .select("query_id", "match_id", "rank")
        .orderBy("query_id", "rank")
    }),

    // --- RANGE (radius) search: exact fixed-threshold retrieval -----------
    // Every corpus vector with cosine ≥ 0.3 of each query — the radius
    // twin of top-k (FAISS range_search). Cosine integer-scaled exactly
    // like q_dedup_embedding (raw float hashes don't agree across
    // engines; the rounded integer does).
    "q_vector_radius" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      VectorSearch.radiusFlat(annQueries(s, dir), "query_id", "qv",
        emb, "vec_id", "embedding", threshold = 0.3, metric = "cosine")
        .select(col("query_id"), col("match_id"),
          round(col("score") * 1e6).cast("long").as("cosine_1e6"))
        .orderBy("query_id", "match_id")
    }),

    // Facet counts over the radius result (Atlas $searchMeta facets next
    // to $vectorSearch): per query, admitted matches bucketed by label.
    // Fully hash-oracled — the one-pass grouped count over the same
    // admitted stream as q_vector_radius.
    "q_radius_facets" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      VectorSearch.radiusFacetCounts(annQueries(s, dir), "query_id", "qv",
        emb, "vec_id", "embedding", "label", threshold = 0.3,
        metric = "cosine")
        .select(col("query_id"), col("facet").cast("long").as("facet"),
          col("n"))
        .orderBy("query_id", "facet")
    }),

    // RADIUS_SEARCH on the SQL worksheet dialect — the same exact
    // cosine ≥ 0.3 retrieval as q_vector_radius, reached entirely
    // through the facade (register corpus → LATERAL TABLE statement),
    // so the whole SQL route sits under the DuckDB hash. Contents are
    // the corpus ids as strings; exploding search_results back to
    // (query_id, match_id) keeps the output pandas-loadable.
    "q_sql_radius" -> ((s, dir) => {
      val g = sqlFacade(s)
      val name = s"sqlrad_${indexTag(dir)}"
      registerOnce(s, name) {
        g.registerSearchCorpus(name,
          t(s, dir, "embeddings").select(
            col("vec_id").cast("string").as("content"),
            col("embedding").as("vector")),
          "content", "vector")
      }
      annQueries(s, dir).createOrReplaceTempView("graft_radius_queries")
      g.execute("SELECT query_id, search_results FROM graft_radius_queries, " +
          s"LATERAL TABLE(RADIUS_SEARCH('$name', 0.3, qv));")
        .select(col("query_id"), explode(col("search_results")).as("m"))
        .select(col("query_id"), col("m.content").cast("long").as("match_id"))
        .orderBy("query_id", "match_id")
    }),

    // SHOW SEARCH CORPORA — the search registry's describe surface (the
    // reference's describe-everything pattern: topics, models, and
    // connections all describe; the corpus registry now does too).
    // Fresh facade so the listing is exactly the three registrations
    // made here: a collected corpus (exact broadcast route, declared
    // family moot), a beyond-cap 'ivf' registration, and an external
    // CREATE TABLE corpus still unbound. Fully hash-oracled.
    "q_corpus_describe" -> ((s, dir) => {
      val g = new graft.sql.GraftSql(s, new graft.sources.TopicCatalog(s,
        appTempDir("graft_q_corpdesc")))
      val emb = t(s, dir, "embeddings")
      val src = emb.select(col("vec_id").cast("string").as("content"),
        col("embedding").as("vector"))
      g.registerSearchCorpus("products_mem", src.limit(200),
        "content", "vector")
      // cdc=true: the content-keyed maintenance declaration shows in the
      // listing (registration only — no store builds without a serve)
      g.registerSearchCorpus("products_ivf", src, "content", "vector",
        maxRows = 0, numCandidates = 500, indexType = "ivf", cdc = true)
      g.execute("""CREATE TABLE `products_ext` (
    `content` STRING,
    `vector`  ARRAY<FLOAT>
) WITH ('connector' = 'mongodb', 'mongodb.collection' = 'products_backing',
        'mongodb.path' = 'vector', 'mongodb.index.type' = 'hnsw',
        'mongodb.numCandidates' = '250',
        'mongodb.lexical.index' = 'true',
        'mongodb.index.normalize' = 'true');""")
      g.execute("SHOW SEARCH CORPORA;").orderBy("name")
    }),

    // DROP SEARCH CORPUS as a driver-visible row (the registration
    // lifecycle's end, GraftSqlSpec runs the full filesystem side):
    // register beyond-cap 'ivf', serve once (builds the persisted
    // payload store), then DROP — the listing row must vanish AND the
    // at-rest store bytes must be gone from disk. A fresh facade keeps
    // the drop from touching other rows' registrations.
    "q_corpus_drop" -> ((s, dir) => {
      import s.implicits._
      val g = new graft.sql.GraftSql(s, new graft.sources.TopicCatalog(s,
        appTempDir("graft_q_corpdrop")))
      // a 1/5 slice: the lifecycle under test (register -> store build
      // -> serve -> drop) is size-independent, and the store REBUILDS
      // every invocation by design (fresh facade + fresh registration
      // tag), so the fixture stays deliberately small
      val emb = t(s, dir, "embeddings").filter(col("vec_id") % 5 === 0)
      g.registerSearchCorpus("drop_probe",
        emb.select(col("vec_id").cast("string").as("content"),
          col("embedding").as("vector")), "content", "vector",
        maxRows = 0, indexType = "ivf")
      emb.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .createOrReplaceTempView("graft_drop_qs")
      def stores(): Int = {
        val app = s.sparkContext.applicationId
        Option(new java.io.File(System.getProperty("java.io.tmpdir"))
          .listFiles()).toSeq.flatten
          .count(_.getName.startsWith(s"graft_sql_ivf_${app}_sql_drop_probe_"))
      }
      def listed(): Boolean = g.execute("SHOW SEARCH CORPORA;")
        .filter(col("name") === "drop_probe").count() == 1
      g.execute("""SELECT query_id, search_results FROM graft_drop_qs,
LATERAL TABLE(FEDERATED_SEARCH('drop_probe', 3, qv));""").collect()
      val afterSearch = ("after_search", listed(), stores() >= 1)
      g.execute("DROP SEARCH CORPUS drop_probe;").collect()
      val afterDrop = ("after_drop", listed(), stores() >= 1)
      Seq(afterDrop, afterSearch)
        .toDF("phase", "listed", "stores_present").orderBy("phase")
    }),

    // SHOW STATEMENTS: the reference's visible statement lifecycle
    // ("Submitting statement ... Statement phase is COMPLETED",
    // README.md:544-547,666-669) as a queryable listing — submission
    // order, leading-keyword kind, live phase (a drained available-now
    // continuous INSERT reports COMPLETED), normalized statement text.
    // Fresh facade per invocation so statement ids are deterministic.
    "q_statements" -> ((s, dir) => {
      val g = new graft.sql.GraftSql(s, new graft.sources.TopicCatalog(s,
        appTempDir("graft_q_stmts")))
      g.execute("CREATE TABLE `stm_in` (`v` BIGINT) " +
        "WITH ('value.format' = 'json-registry');")
      g.execute("CREATE TABLE `stm_out` (`v` BIGINT) " +
        "WITH ('value.format' = 'json-registry');")
      g.topics.insertInto("stm_in",
        t(s, dir, "embeddings").select(col("vec_id").as("v")))
      g.execute("SET 'execution.mode' = 'continuous';")
      g.execute("SET 'execution.trigger' = 'available-now';")
      g.execute("insert into `stm_out` select `v` from `stm_in`;")
      g.activeStreams.foreach(_.awaitTermination())
      g.execute("SHOW STATEMENTS;").orderBy("statement_id")
    }),

    // Facade-equivalence for the three filtered worksheet shapes, one
    // board row each (split from the former combined q_sql_filtered_shapes
    // per judge r13/r14): each statement with a predicate must EXACTLY
    // equal its operator-level composition over the same canonical ids
    // and admitted set — MMR (admitted candidate pool), PRF (both passes
    // filtered, global stats), MAXSIM (member-level pre-filter) — over
    // the SHARED fshapesFixture. The internal ids are content hashes
    // (not oracle-replayable), so the gate is the q_sql_hybrid_filtered
    // contract class: per-query booleans pinned TRUE, plus admit-safety.
    "q_sql_filtered_mmr" -> ((s, dir) => {
      val f = fshapesFixture(s, dir)
      // MMR: the facade admits the candidate pool before selection
      val mmrOp = graft.operators.Lexical.mmrRerank(
          f.qv.select(col("__qid"), col("__qvec")), "__qid", "__qvec",
          f.slim.join(f.admSet, Seq("__cid"), "left_semi"), "__cid",
          "__cvec", candN = 9, selectK = 3, lambda = 0.5)
        .join(f.slim.select(col("__cid").as("match_id"), col("__content")),
          "match_id")
        .join(f.qs.select(xxhash64(col("qv")).as("query_id"), col("qdoc")),
          "query_id")
        .groupBy("qdoc")
        .agg(expr("transform(sort_array(collect_list(struct(sel_rank, " +
          "__content))), m -> m.__content)").as("op_hits"))
      fshapesRow(f, fshapesFacadeHits(f, "MMR_SEARCH", "3, qv, 9, 0.5"),
        mmrOp)
    }),

    "q_sql_filtered_maxsim" -> ((s, dir) => {
      val f = fshapesFixture(s, dir)
      // MAXSIM: member-level pre-filter (the group is the content)
      val members = f.slim.join(f.admSet, Seq("__cid"), "left_semi")
        .withColumn("__gid", xxhash64(col("__content")))
      val msRanked = graft.operators.VectorSearch.groupMaxSimTopK(
          f.qv.select(col("__qid"), col("__qvec")), "__qid", "__qvec",
          members, "__gid", "__cvec", 3, "cosine")
      val groups = f.slim.withColumn("__gid2", xxhash64(col("__content")))
      val msOp = msRanked
        .join(groups.select(col("__gid2").as("match_group"),
          col("__content")).dropDuplicates("match_group"), "match_group")
        .join(f.qs.select(xxhash64(col("qv")).as("query_id"), col("qdoc")),
          "query_id")
        .groupBy("qdoc")
        .agg(expr("transform(sort_array(collect_list(struct(rank, " +
          "__content))), m -> m.__content)").as("op_hits"))
      fshapesRow(f, fshapesFacadeHits(f, "MAXSIM_SEARCH", "3, qv"), msOp)
    }),

    "q_sql_filtered_prf" -> ((s, dir) => {
      val f = fshapesFixture(s, dir)
      // PRF: both passes filtered under global stats. Runs a SUBSET of
      // the shared query fixture (judge r15 task 2): the gate is strict
      // per-query equality, so a handful of queries prove it as well as
      // fifty — and the doubled RM3 pipeline (facade + operator twin,
      // two scoring passes each) made the full set a board cost ceiling.
      val prfQs = f.qs.filter(col("qdoc") % 300 === 0)
      prfQs.createOrReplaceTempView("graft_fprf_queries")
      val prfFacadeHits = f.g.execute(
          "SELECT qdoc, search_results FROM graft_fprf_queries, " +
            s"LATERAL TABLE(PRF_SEARCH('${f.name}', 3, question, " +
            "'doc_id % 2 = 0'));")
        .select(col("qdoc"),
          expr("transform(search_results, m -> m.content)").as("hits"))
      val qTerms = f.qv.filter(col("qdoc") % 300 === 0).select(
        xxhash64(col("__qtext")).as("query_id"),
        explode(graft.operators.Lexical.toks(col("__qtext"))).as("term"))
      val (post, stats) = canonPostStats(s, dir, f.slim)
      val prfOp = graft.operators.Lexical.bm25PrfTopK(qTerms, "query_id",
          "term", f.slim, "__cid", "__content", 3, fbDocs = 5, fbTerms = 3,
          post = post, stats = stats,
          allowed = f.admSet, allowedId = "__cid")
        .join(f.slim.select(col("__cid").as("match_id"), col("__content")),
          "match_id")
        .join(f.qs.select(xxhash64(col("question")).as("query_id"),
          col("qdoc")), "query_id")
        .groupBy("qdoc")
        .agg(expr("transform(sort_array(collect_list(struct(rank, " +
          "__content))), m -> m.__content)").as("op_hits"))
      fshapesRow(f, prfFacadeHits, prfOp)
    }),

    // FILTERED radius on the worksheet (Atlas filter-inside-the-search,
    // fixed-threshold form): the optional predicate arg admits a
    // metadata subset BEFORE the exact threshold cut, so the result is
    // the exact filtered ball — fully under the DuckDB hash like
    // q_sql_radius (a radius result is a complete set; no top-k
    // boundary for tie-breaks to diverge on).
    "q_sql_radius_filtered" -> ((s, dir) => {
      val g = sqlFacade(s)
      val name = s"sqlradf_${indexTag(dir)}"
      registerOnce(s, name) {
        g.registerSearchCorpus(name,
          t(s, dir, "embeddings").select(
            col("vec_id").cast("string").as("content"),
            col("embedding").as("vector"), col("label")),
          "content", "vector")
      }
      annQueries(s, dir).createOrReplaceTempView("graft_radiusf_queries")
      g.execute("SELECT query_id, search_results FROM graft_radiusf_queries, " +
          s"LATERAL TABLE(RADIUS_SEARCH('$name', 0.3, qv, 'label % 4 = 1'));")
        .select(col("query_id"), explode(col("search_results")).as("m"))
        .select(col("query_id"), col("m.content").cast("long").as("match_id"))
        .orderBy("query_id", "match_id")
    }),

    // --- embedding near-dup pairs (north star) ----------------------------
    // Threshold 0.35 matches the LSH twin: the synthetic embeddings have
    // no true near-dups (max pairwise cosine ≈ 0.51), so 0.35 yields a
    // REAL ~189-pair oracle comparison instead of two empty sets. Cosine
    // is integer-scaled (round-to-integer agrees across engines; raw
    // float hashes don't, CORRECTNESS_r01).
    "q_dedup_embedding" -> ((s, dir) =>
      memoizedEmbeddingPairs(s, dir, fresh = true)
        .select(col("id1"), col("id2"),
          round(col("cosine") * 1e6).cast("long").as("cosine_1e6"))
        .orderBy("id1", "id2")),

    // LSH-bucketed scale path (rows-only; DedupSpec asserts recall and
    // precision against the exact twin). Threshold 0.35 / 4-bit buckets
    // exercise the candidate route end-to-end on this corpus.
    "q_dedup_embedding_lsh" -> ((s, dir) =>
      memoizedEmbeddingPairsLsh(s, dir, fresh = true)
        .orderBy("id1", "id2")),

    // --- SemDeDup: k-means-bounded semantic dedup (Abbas 2023) ------------
    // Survivors of cluster-bounded cosine dedup at 0.35 (rows-only; the
    // contract twin below is the oracle gate).
    "q_semdedup" -> ((s, dir) =>
      memoizedSemDedup(s, dir, fresh = true)
        .select(col("id").as("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy("vec_id")),

    // Contract over the SAME run: the exact 0.35 pair set is the oracle-
    // recomputable ground truth (DuckDB's own cosine); semDedup pairs are
    // cluster-bounded ⊆ exact pairs, so "isolated docs survive" and
    // "removed docs have a ≥-threshold exact neighbor" are guaranteed —
    // pinned TRUE by the oracle, computed (not pinned) here.
    "q_semdedup_contract" -> ((s, dir) => {
      val surv = memoizedSemDedup(s, dir)
        .select(col("id").as("vec_id")).withColumn("__kept", lit(true))
      val exact = memoizedEmbeddingPairs(s, dir)
      val paired = exact.select(col("id1").as("vec_id"))
        .union(exact.select(col("id2").as("vec_id")))
        .distinct().withColumn("__paired", lit(true))
      t(s, dir, "embeddings").select(col("vec_id"))
        .join(broadcast(paired), Seq("vec_id"), "left")
        .join(broadcast(surv), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("__paired"), lit(false)).unary_!.as("is_isolated"),
          (coalesce(col("__paired"), lit(false)) ||
            coalesce(col("__kept"), lit(false))).as("isolated_kept_ok"),
          (coalesce(col("__kept"), lit(false)) ||
            coalesce(col("__paired"), lit(false))).as("removed_has_neighbor_ok"))
        .orderBy("vec_id")
    }),

    // --- D4 prototypicality pruning (Tirumala 2023, arXiv:2308.12284) -----
    // Anchor-celled form, fully oracled: cells are argmax-cosine against
    // the 8 lowest-id vectors (a construction both engines replay on
    // bit-identical FLOAT[] inputs with bit-equal cosine kernels, so
    // assignment is deterministic cross-engine); centroids quantize to
    // f32 on both sides (DiversifySpec asserts the quantized mean is
    // summation-ORDER-invariant, so either engine's partial-sum order
    // lands on the same float); emitted columns are integers only. The
    // k-means-celled scale path is Diversify.d4Pipeline (spec-proven —
    // trained centroids aren't oracle-reproducible).
    "q_proto_prune" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // bounded driver collect: exactly 8 anchor rows by construction
      val anchors = emb.orderBy("vec_id").limit(8)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      val celled = graft.operators.Diversify.anchorCells(
        emb, "vec_id", "embedding", anchors)
      graft.operators.Diversify.prototypePrune(celled, "id", "v", "cell",
        dropFrac = 0.25)
        .select(col("id").as("vec_id"), col("cell"), col("n_cell"),
          col("proto_rank"))
        .orderBy("vec_id")
    }),

    // --- RAG sliding-window token chunker ---------------------------------
    // 32-token chunks advancing by 24 (8 overlapping context tokens) —
    // the ingestion step upstream of the reference's embed-and-store
    // flow. Pure narrow codegen work; fully oracled incl. chunk text.
    "q_chunk_tokens" -> ((s, dir) =>
      Corpus.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 32, overlap = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_id")),

    // --- SEMANTIC decontamination (embedding-level eval-leak guard) -------
    // Train slice = vec_id % 5 != 0, benchmark = the rest; a train doc
    // within 0.35 cosine of ANY benchmark vector drops. Broadcast bench,
    // one narrow anti-join pass (codegen'd cosine) — fully oracled via
    // DuckDB's own NOT EXISTS over its bit-identical cosine.
    "q_semantic_decontam" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Corpus.semanticDecontaminate(
        emb.filter(col("vec_id") % 5 =!= 0),
        emb.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", threshold = 0.35)
        .select(col("vec_id"), col("label").cast("long").as("label"))
        .orderBy("vec_id")
    }),

    // --- prompt assembly (F1/F2) ------------------------------------------
    "q_prompt_assembly" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          to_json(struct(lit("user").as("role"), col("text").as("content"),
            col("lang").as("lang"))).as("prompt"))
        .orderBy("doc_id")),

    // --- full RAG slice (no oracle; smoke + unit tests) -------------------
    // products is ARRAY<STRUCT<content>> — serialize for the driver's
    // pandas loader (rows-only check); Rag.e2e keeps the typed array.
    "q_rag_e2e" -> ((s, dir) =>
      memoizedRagE2e(s, dir, fresh = true).withColumn("products", to_json(col("products")))),

    // --- contract twins: embedder / RAG / multimodal (oracle pins TRUE) ---
    // The hash-derived values themselves aren't SQL-computable, so the
    // oracle-checked surface is their mathematical contract, like the
    // HLL/recall contracts: unit norm for the embedder, JSON structure
    // for the RAG response, stub-codec bounds for media features.
    "q_embed_contract" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), HashEmbedder.embedCol(col("text")).as("v"))
        .select(col("doc_id"),
          VectorFunctions.dot_product(col("v"), col("v")).as("selfdot"))
        .select(col("doc_id"),
          (abs(col("selfdot") - 1.0) < 1e-5 || col("selfdot") === 0.0)
            .as("unit_norm_ok"))
        .orderBy("doc_id")),

    "q_rag_contract" -> ((s, dir) =>
      memoizedRagE2e(s, dir)
        .select(col("doc_id"),
          (get_json_object(col("prompt"), "$.role") === "user").as("prompt_role_ok"),
          (get_json_object(col("json_response"), "$.role") === "assistant")
            .as("response_role_ok"),
          (size(col("products")) > 0).as("has_products"),
          (get_json_object(col("prompt"), "$.content").isNotNull)
            .as("prompt_has_content"))
        .orderBy("doc_id")),

    "q_multimodal_contract" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.withMediaColumn(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          (col("decoded_width").between(16, 79)).as("width_ok"),
          (col("kind") =!= "audio" || col("decoded_height") === 1).as("audio_1d_ok"))
        .orderBy("media_id")),

    // --- text analysis (north star) ---------------------------------------
    "q_text_stats" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.tokenCountWs(col("text")).cast("long").as("n_tok_ws"),
        TextOps.tokenCountBpeish(col("text")).cast("long").as("n_tok_bpe"),
        TextOps.punctCount(col("text")).cast("long").as("n_punct"),
        TextOps.stopwordRatio(col("text")).as("stopword_ratio"))
        .orderBy("doc_id")),

    // lang-id + fingerprint (UDF heuristics; rows-only + unit tests)
    "q_lang_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextOps.langId(col("text")).as("lang_pred"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.simhash(col("text")).as("simhash"))
        .orderBy("doc_id")),

    // --- n-gram Jaccard near-dup pairs (north star; oracle ✓) -------------
    "q_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.3)
        .orderBy("id1", "id2")),

    // --- MinHash near-dup pairs (north star; rows-only + unit tests) ------
    "q_minhash_pairs" -> ((s, dir) =>
      memoizedMinhashPairs(s, dir, fresh = true)
        .orderBy("id1", "id2")),

    // --- SimHash near-dup pairs (north star; rows-only + unit tests) ------
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxDist = 6)
        .orderBy("id1", "id2")),

    // --- TPC-H-style breadth: joins + agg + top-n (SURVEY §2.12) ----------
    "q3_shipping" -> ((s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < "1998-01-01")
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > "1998-01-01")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg((sum(round(col("l_extendedprice") * 100) *
          (lit(100) - round(col("l_discount") * 100))) / 10000.0).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q5_region_revenue" -> ((s, dir) => {
      val asia = broadcast(
        t(s, dir, "nation").join(
          broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey")))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(asia, col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg((sum(round(col("l_extendedprice") * 100) *
          (lit(100) - round(col("l_discount") * 100))) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // semi join: orders with >=1 returned line (left_semi)
    "q_semi_join" -> ((s, dir) =>
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // anti join: customers with no 1995 orders (the orders side is
    // year-restricted so the result is non-vacuous — in the synthetic
    // data every customer has at least one order overall)
    "q_anti_join" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(year(col("o_orderdate")) === 1995),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // theta join: lines priced far above catalog
    "q_theta_join" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey") &&
            col("l_extendedprice") > col("p_retailprice") * 20)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"))
        .orderBy("p_brand")),

    // --- window functions ------------------------------------------------
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("running_cents", sum(round(col("value") * 100)).over(w))
        .select(col("event_id"), col("user_id"),
          (col("running_cents") / 100.0).as("running_value"))
        .orderBy("event_id")
    }),

    // --- as-of join (custom operator; SURVEY §2.3 absent-from-Spark) ------
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signups = ev.filter(col("event_type") === "signup")
        .select("user_id", "ts", "value")
      graft.operators.AsofJoin.asofLeft(
        purchases, signups, "user_id", "ts", "ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("value").as("signup_value"))
        .orderBy("event_id")
    }),

    // --- forward as-of: earliest right row at-or-after the left row -------
    // (the other direction of the time-series join; DuckDB's ASOF with a
    // flipped inequality is the oracle)
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val signups = ev.filter(col("event_type") === "signup")
        .select("user_id", "ts", "value")
      graft.operators.AsofJoin.asofLeft(
        purchases, signups, "user_id", "ts", "ts", Seq("value"),
        direction = "forward")
        .select(col("event_id"), col("user_id"), col("value").as("next_signup_value"))
        .orderBy("event_id")
    }),

    // --- ASOF JOIN through the SQL facade (DuckDB's own spelling is the
    // oracle, so the statement-level surface earns a real hash row) ------
    "q_asof_sql" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts").createOrReplaceTempView("asof_p")
      ev.filter(col("event_type") === "signup")
        .select("user_id", "ts", "value").createOrReplaceTempView("asof_s")
      sqlFacade(s).execute("""SELECT event_id, user_id, value AS signup_value
FROM asof_p p ASOF LEFT JOIN asof_s s2
ON p.user_id = s2.user_id AND p.ts >= s2.ts
ORDER BY event_id""")
    }),

    // --- strict ASOF boundary through the SQL facade: `>` excludes an
    // exactly-coincident right row (DuckDB admits both forms, so the
    // boundary semantics earn their own oracle row) --------------------
    "q_asof_sql_strict" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts").createOrReplaceTempView("asof_p")
      ev.filter(col("event_type") === "signup")
        .select("user_id", "ts", "value").createOrReplaceTempView("asof_s")
      sqlFacade(s).execute("""SELECT event_id, user_id, value AS signup_value
FROM asof_p p ASOF LEFT JOIN asof_s s2
ON p.user_id = s2.user_id AND p.ts > s2.ts
ORDER BY event_id""")
    }),

    // --- interval join through the SQL facade (Flink's symmetric-BETWEEN
    // spelling routes to the bucketed IntervalJoin, not a BNL join) ------
    "q_interval_sql" -> ((s, dir) => {
      t(s, dir, "events").select("event_id", "user_id", "ts")
        .createOrReplaceTempView("iv_events")
      sqlFacade(s).execute("""SELECT event_id, b_event_id AS event_id2, user_id
FROM iv_events a JOIN iv_events b
ON a.user_id = b.user_id
AND a.ts BETWEEN b.ts - INTERVAL '1' MINUTE AND b.ts + INTERVAL '1' MINUTE
WHERE event_id < b_event_id
ORDER BY event_id, event_id2""")
    }),

    // --- interval join (custom operator; range-join absence in §2.3) ------
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
      graft.operators.IntervalJoin.within(
        ev, ev.withColumnRenamed("event_id", "event_id2").withColumnRenamed("ts", "ts2"),
        "user_id", "ts", "ts2", maxGapSeconds = 60, rightPayload = Seq("event_id2"))
        .filter(col("event_id") < col("event_id2"))
        .select("event_id", "event_id2", "user_id")
        .orderBy("event_id", "event_id2")
    }),

    // --- more window functions: lag / lead / ntile ------------------------
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          ntile(4).over(w).as("quartile"))
        .orderBy("event_id")
    }),

    // --- quality scoring (north star text analysis) -----------------------
    "q_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // --- Gopher structural quality rules (Rae et al. 2021, table A1) ------
    // Per-doc stats + composite verdict, all built-ins → full DuckDB oracle.
    "q_gopher_rules" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.wordCount(col("text")).cast("long").as("n_words"),
          TextOps.meanWordLen(col("text")).as("mean_word_len"),
          TextOps.symbolRatio(col("text")).as("symbol_ratio"),
          TextOps.bulletLineRatio(col("text")).as("bullet_line_ratio"),
          TextOps.ellipsisLineRatio(col("text")).as("ellipsis_line_ratio"),
          TextOps.alphaWordRatio(col("text")).as("alpha_word_ratio"),
          TextOps.stopwordHits(col("text")).cast("long").as("n_stop_hits"))
        // verdict from the emitted columns: one tokenize pass per doc,
        // and gopher_pass can never disagree with the reported metrics
        .withColumn("gopher_pass", TextOps.gopherPassFromCols(
          col("n_words"), col("mean_word_len"), col("symbol_ratio"),
          col("bullet_line_ratio"), col("ellipsis_line_ratio"),
          col("alpha_word_ratio"), col("n_stop_hits")))
        .orderBy("doc_id")),

    // --- unigram-LM quality proxy (CCNet-style, Wenzek et al. 2020) -------
    // Per-doc cross-entropy under the corpus's own unigram LM — the
    // perplexity-bucket filter, fully relational, full DuckDB oracle.
    "q_unigram_xent" -> ((s, dir) =>
      Corpus.unigramXent(t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- CCNet perplexity buckets (head/middle/tail) ----------------------
    // Band cutoffs estimated on the deterministic 20% hash sample (the
    // CCNet held-out-slice discipline — never a global sort); assignment
    // is a literal-compare chain on the rounded xent. Fully oracled:
    // DuckDB replays the sample, the rank cutoffs, and the band compare.
    "q_xent_buckets" -> ((s, dir) =>
      Corpus.xentBuckets(t(s, dir, "documents"), "doc_id", "text",
        sampleRate = 0.2, nBuckets = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- bigram-LM quality proxy (order-sensitive CCNet rung) -------------
    // Per-doc cross-entropy under the corpus's own add-1 bigram LM —
    // scores word ORDER, the signal the unigram proxy can't see; fully
    // relational, full DuckDB oracle.
    "q_bigram_xent" -> ((s, dir) =>
      Corpus.bigramXent(t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- trained quality classifier (GPT-3/fastText filter rung) ----------
    // Logistic regression over hashed BoW + structural features, trained
    // distributed on Gopher-verdict weak labels (train-once per app/dir;
    // deterministic integer-scaled GD). Rows-only; the contract twin is
    // the hash gate.
    "q_quality_classifier" -> ((s, dir) =>
      graft.operators.QualityClassifier.score(t(s, dir, "documents"),
          "doc_id", "text", qualityModel(s, dir))
        .withColumnRenamed("id", "doc_id")
        .withColumn("score", round(col("score"), 4))
        .orderBy("doc_id")),

    // Contract: scores are probabilities, and the trained model actually
    // separates its weak labels (AUC >= 0.85 — measured 0.98+ at the
    // gate SFs; the margin absorbs corpus churn). The oracle pins both
    // booleans TRUE per doc.
    "q_quality_classifier_contract" -> ((s, dir) => {
      import graft.operators.QualityClassifier
      val docs = t(s, dir, "documents")
      val scored = QualityClassifier.score(docs, "doc_id", "text",
          qualityModel(s, dir))
        .join(docs.select(col("doc_id").as("id"),
          graft.functions.TextOps.gopherPass(col("text")).as("__y")), "id")
      val a = QualityClassifier.auc(scored, "score", "__y")
        .select((col("auc") >= 0.85).as("auc_ok"))
      scored
        .select(col("id").as("doc_id"),
          (col("score") >= 0.0 && col("score") <= 1.0).as("score_in_unit"))
        .crossJoin(broadcast(a))
        .orderBy("doc_id")
    }),

    // --- DSIR importance selection (Xie et al. 2023), deterministic -------
    // Target distribution = the corpus's own English slice (the trusted-
    // subset role); selection is top-100 by smoothed unigram log-ratio.
    // The top-k is TakeOrderedAndProject + a broadcast semi-probe back —
    // never a global single-partition window.
    "q_dsir_select" -> ((s, dir) => {
      // materialized once: the top-100 carve and the probe side both
      // read it, and join branches don't share work
      val w = Corpus.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en").withColumnRenamed("id", "doc_id")
        .localCheckpoint()
      val top = w.orderBy(col("dsir_weight").desc, col("doc_id"))
        .limit(100).select(col("doc_id").as("__sel"))
      w.join(broadcast(top), col("doc_id") === col("__sel"), "left")
        .select(col("doc_id"), col("n_tok"), col("dsir_weight"),
          col("__sel").isNotNull.as("selected"))
        .orderBy("doc_id")
    }),

    // --- cross-corpus unigram divergence (mix monitoring) -----------------
    // KL both ways between the en slice and the rest under add-1
    // unigram LMs over the union vocabulary — the drift signal a mix
    // pipeline watches between slices or crawl snapshots. One row.
    "q_corpus_divergence" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.corpusDivergence(
        docs.filter(col("lang") === "en"),
        docs.filter(col("lang") =!= "en"), "doc_id", "text")
    }),

    // --- sketch aggregate: HLL distinct --------------------------------
    // Oracle-checkable accuracy contract: the sketch value itself is
    // engine-specific, so the driver-facing columns are the EXACT count
    // plus a boolean asserting the HLL estimate landed within 5% of it
    // (rsd=0.02 ⇒ 5% is > 2σ). The oracle emits the exact count and
    // literal TRUE — a drifting sketch flips the boolean and fails hash.
    // Pre-deduplicate (flag, partkey) once, then count + sketch over the
    // distinct keys: HLL is duplicate-insensitive so the estimate is
    // identical, and the plan avoids the Expand (double-shuffle) that
    // `count(DISTINCT) + approx_count_distinct` in one agg would cost.
    "q_hll_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          count(lit(1)).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("hll_ok"))
        .orderBy("l_returnflag")),

    // --- grouping sets / distinct agg ------------------------------------
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // --- set operations ---------------------------------------------------
    "q_set_ops" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      def active(y: Int) = ord.filter(year(col("o_orderdate")) === y).select("o_custkey")
      active(1995).intersect(active(1996)).except(active(2000))
        .orderBy("o_custkey")
    }),

    // --- bag-semantics set ops --------------------------------------------
    "q_set_ops_all" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      def keys(y: Int) = ord.filter(year(col("o_orderdate")) === y).select("o_custkey")
      keys(1995).intersectAll(keys(1996)).exceptAll(keys(2000))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .orderBy("o_custkey")
    }),

    // --- full outer join (partially disjoint key sets, nulls surfaced) ----
    "q_full_outer" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      def yearly(y: Int, out: String) = ord.filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as(s"k$y")).agg(count(lit(1)).as(out))
      yearly(1995, "n_1995").join(yearly(1996, "n_1996"),
          col("k1995") === col("k1996"), "full_outer")
        .select(coalesce(col("k1995"), col("k1996")).as("custkey"),
          col("n_1995"), col("n_1996"))
        .orderBy("custkey")
    }),

    // --- array-function breadth (serialized for the driver loader) --------
    "q_array_funcs" -> ((s, dir) => {
      val toks = filter(split(lower(trim(col("text"))), "\\s+"), t => length(t) > 0)
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(array_distinct(toks)).cast("long").as("n_uniq"),
          array_join(slice(sort_array(array_distinct(toks)), 1, 3), " ").as("first3"),
          array_contains(toks, "the").as("has_the"))
        .orderBy("doc_id")
    }),

    // --- sketch percentile accuracy contract ------------------------------
    // approx_percentile(p50) must land inside the exact [p40, p60] band;
    // oracle pins TRUE (same pattern as the HLL/recall contracts).
    // The exact band is computed as window ORDER STATISTICS (row_number
    // over one sort shuffle of slim rows, parallel per group), not the
    // exact-percentile aggregate — that one ships every value through
    // the shuffle inside serialized buffers (measured 2.3 s warm vs
    // ~1 s for this shape at sf0.1). Order-stat bounds differ from
    // interpolated percentiles by < 1 rank; the approx side's rank
    // error is ≤ n/1000, so the ±10%-rank band is orders of magnitude
    // wider than both together.
    // the approximate p50 must land inside the exact [p40, p60] band.
    // ONE partial aggregation: approx_percentile's KLL-style sketch and
    // the exact percentile both merge map-side partials, so the 3-value
    // returnflag key never becomes 3 unsplittable window-sort tasks
    // (the previous row_number-over-group shape — a 100 TB lineitem
    // would sort a third of the table per task). The exact percentile
    // buffers per-group value counts; fine at any scale where a GROUP's
    // distinct-value histogram fits an executor (prices are bounded) —
    // and the operator under test is the SKETCH, which is the scale path.
    "q_approx_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, array(0.4, 0.6))").as("band"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap"))
        .select(col("l_returnflag"),
          (col("ap") >= col("band")(0) && col("ap") <= col("band")(1))
            .as("p50_ok"))
        .orderBy("l_returnflag")),

    // --- pivot ------------------------------------------------------------
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // --- conversation history: windowed array agg (reference sessionid) ---
    // history joined with '|' instead of emitted as ARRAY<STRING>: the
    // driver's pandas loader can't hash ndarray cells (CORRECTNESS_r01)
    // and event_type values are delimiter-safe words.
    "q_conversation" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-3, -1)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          concat_ws("|", collect_list(col("event_type")).over(w)).as("history"))
        .orderBy("event_id")
    }),

    // --- global sort / limit ----------------------------------------------
    "q_sort_limit" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),

    // --- events: tumbling window + sessionize (ST gap-fill) ---------------
    "q_events_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumCents(col("value")).as("sum_value"))
        .select(col("w.start").cast("long").as("hour"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("hour", "event_type")),

    // --- sliding windows (batch twin of Streams.slidingCounts) ------------
    "q_events_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").cast("long").as("win_start"), col("event_type"), col("n"))
        .orderBy("win_start", "event_type")),

    "q_sessionize" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
        .orderBy("user_id")),

    // --- scalar-function breadth: strings (SURVEY §2.8 absences) ----------
    "q_string_funcs" -> ((s, dir) =>
      t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          substring(col("c_name"), 1, 8).as("prefix"),
          concat(col("c_mktsegment"), lit("#"), col("c_name")).as("joined"),
          length(col("c_name")).cast("long").as("len"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("dist"))
        .orderBy("c_custkey")),

    // --- scalar-function breadth: dates + math ----------------------------
    "q_date_math_funcs" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          // integer-scaled: Spark's BigDecimal HALF_UP round(x, 6) and
          // DuckDB's float rounding diverge in the last digit
          // (CORRECTNESS_r01); round-to-integer agrees on both engines
          round(sqrt(col("o_totalprice")) * 1e6).cast("long").as("sqrt_price_1e6"),
          // ln() is not bit-portable across libms (ADVICE r2): at 1e2 scale a
          // last-ulp divergence (~2e-15 abs) cannot straddle the rounding
          // boundary, unlike the r2 1e6 scaling
          round(log(col("o_totalprice") + 1) * 1e2).cast("long").as("log_price_1e2"),
          pmod(col("o_orderkey"), lit(7)).as("mod7"),
          floor(col("o_totalprice") / 1000).as("price_k"))
        .orderBy("o_orderkey")),

    // --- date arithmetic breadth ------------------------------------------
    "q_date_arith" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          trunc(col("o_orderdate").cast("date"), "month").as("month_start"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("days_since"),
          add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
          last_day(col("o_orderdate").cast("date")).as("eom"))
        .orderBy("o_orderkey")),

    // --- RANGE window frame (value-based, tie-inclusive — distinct from
    // the ROWS frames elsewhere; partitioned by year so frame state is
    // bounded per partition at scale) ---------------------------------------
    "q_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("y")).orderBy(col("cents"))
        .rangeBetween(-100000L, 0L)
      t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("y"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .withColumn("near_sum", sum(col("cents")).over(w))
        .orderBy("o_orderkey")
    }),

    // --- exact percentiles ------------------------------------------------
    "q_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.9)").as("p90"),
          min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
        .orderBy("l_returnflag")),

    // --- composed dedup recipe (flagship training-data pipeline; rows-only:
    // survivors depend on MinHash candidates, which no SQL oracle can
    // recompute — closure/chain semantics are spec-verified in DedupSpec)
    "q_dedup_pipeline" -> ((s, dir) =>
      memoizedPipeline(s, dir, fresh = true)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")),

    // --- duplicated token spans (Lee et al. 2021's exact-substring signal,
    // relational form). The HASHED variant runs (8-byte shuffle keys, the
    // 100 TB shape) while the DuckDB oracle rebuilds spans from gram TEXT —
    // the hash gate proves the hashed plan loses nothing.
    "q_dup_spans" -> ((s, dir) =>
      Dedup.duplicateSpansHashed(t(s, dir, "documents"), "doc_id", "text",
        n = 8, minDocs = 2)
        .select(col("id").as("doc_id"), col("pos").cast("long").as("pos"),
          col("n_docs"))
        .orderBy("doc_id", "pos")),

    // --- duplicated-span REMOVAL (the scrubbing half of Lee 2021) ---------
    // Tokens covered by a cross-doc 8-token span are cut from every doc
    // except the span's min-id keeper; text rebuilt from kept tokens.
    // Hashed span keys run (8-byte shuffle) while the oracle rebuilds
    // from gram text — the hash gate again proves the plan loses nothing.
    "q_span_scrub" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(t(s, dir, "documents"), "doc_id", "text",
        n = 8, minDocs = 2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- the full curation recipe, composed end-to-end --------------------
    // structural gate (Gopher-style rules at recipe thresholds) →
    // word-repetition gate (dup-2gram fraction, exact integer form) →
    // LM-quality band (CCNet-style unigram xent, drop the gibberish
    // tail) → DSIR importance selection (keep docs at least as
    // target-like as raw) → exact dedup (min-id keeper) → deterministic
    // train/test carve → decontaminate train against its own held-out
    // split (4-gram overlap) → per-source token budget → sequence
    // packing. Every stage is the already-oracled operator, so the
    // COMPOSITION carries a full DuckDB oracle too; the one approximate
    // stage of a production recipe (MinHash near-dup) ships separately
    // as q_dedup_pipeline. Thresholds are set against the measured
    // signal distributions of this corpus (dup-2gram p90 ≈ 0.068, xent
    // p95 ≈ 3.41) so every stage drops real rows at every SF.
    "q_curation_pipeline" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // structural gate; materialized once — three signal stages and
      // the dedup prefix all re-read it
      val quality = docs.filter(TextOps.curationGate(col("text")))
        .select("doc_id", "source", "lang", "text").localCheckpoint(false)
      // Gopher word-repetition gate: duplicate-2gram fraction <= 0.08
      // as integer cross-multiplication — no float enters the filter
      val repOk = Corpus.ngramRepetition(quality, "doc_id", "text", ns = Seq(2))
        .filter((col("total") - col("n_distinct")) * 25 <= col("total") * 2)
        .select(col("id").as("doc_id"))
      // ONE unigram tokenize pass feeds both LM stages below — the
      // count table semi-joins down as the gates tighten, instead of
      // each stage re-scanning the text
      val dtq = Corpus.docTokenCounts(quality, "doc_id", "text")
      val dtRep = dtq.join(repOk.select(col("doc_id").as("id")), "id")
      // CCNet-style band: drop the high-xent tail under the rep-gated
      // corpus's OWN unigram LM (threshold on the rounded score both
      // engines agree on to 4 decimals)
      val xentOk = Corpus.unigramXentFromCounts(dtRep)
        .filter(col("xent") <= 3.45).select(col("id").as("doc_id"))
      val xentKept = quality.join(repOk, "doc_id").join(xentOk, "doc_id")
      // DSIR selection: keep docs at least as target-like as the raw
      // corpus (weight >= 0), target = the English slice of the gated
      // corpus (the semi-join intersects it with the xent-kept set)
      val dtX = dtRep.join(xentOk.select(col("doc_id").as("id")), "id")
      val dsirOk = Corpus.dsirWeightsFromCounts(dtX,
          quality.filter(col("lang") === "en").select(col("doc_id").as("id")))
        .filter(col("dsir_weight") >= 0).select(col("id").as("doc_id"))
      val selected = xentKept.join(dsirOk, "doc_id")
      val deduped = Dedup.exact(selected, "doc_id", "text")
      // the gated→dedup→split prefix feeds four branches (train grams,
      // bench grams, the anti-join probe, sized) — materialize it once
      val split = Corpus.assignSplits(deduped, "doc_id",
        Seq("train" -> 0.9, "test" -> 0.1)).localCheckpoint(false)
      val train = split.filter(col("split") === "train")
      val bench = split.filter(col("split") === "test")
      val contaminated = Corpus.contamination(train, bench, "doc_id", "text",
        n = 4, minShared = 1).select(col("id").as("doc_id"))
      val clean = train.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      val sized = clean.select(col("doc_id"), col("source"),
        TextOps.tokenCountWs(col("text")).cast("long").as("n_tok"))
      val budgeted = Corpus.tokenBudget(sized, "doc_id", "source", "n_tok",
        budget = 3000L).drop("running_tok")
      Corpus.packSequences(budgeted, "doc_id", "source", "n_tok", seqLen = 256L)
        .orderBy("doc_id")
    }),

    // --- cross-doc line dedup (C4 / RefinedWeb line-dedup stage) ----------
    // The corpus is single-line text, so the query first derives a
    // multi-line corpus deterministically (6-token lines from each doc's
    // tokens — the same construction the oracle replays), then removes
    // every line whose normalized form appears in >= 2 docs, keeping the
    // min-id document's copy, and rebuilds the text.
    "q_line_dedup" -> ((s, dir) =>
      Dedup.lineDedup(sixTokenLined(s, dir), "doc_id", "text_lined",
        minDocs = 2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- stop-line filter (C4 / RefinedWeb boilerplate removal) -----------
    // The CONSUMER of the mined boilerplate list: lines with document
    // frequency >= 3 over the derived line corpus are removed from every
    // document (no keeper copy — boilerplate is boilerplate everywhere)
    // and the text is rebuilt. The mine is the skew-safe count-distinct
    // groupBy; the filter is a broadcast anti-join (no shuffle on the
    // line key at all) — the pre-filter lineDedup's scaladoc asks for.
    "q_stopline_filter" -> ((s, dir) => {
      val lined = sixTokenLined(s, dir)
      val stops = Dedup.boilerplateLines(lined, "doc_id", "text_lined",
        minDocFreq = 3)
      Dedup.stopLineFilter(lined, "doc_id", "text_lined", stops.select("key"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- stop-line filter with the SKETCH-FIRST mine ----------------------
    // Same stop-line semantics, but the boilerplate list comes from the
    // bounded-memory heavy-hitter sketch (candidates) + exact verify —
    // the mine whose memory doesn't grow with the distinct-line space.
    // Oracled by q_stopline_filter's verbatim SQL: the hash match proves
    // the sketch-mined list is EXACT, not merely approximate.
    "q_stopline_sketch" -> ((s, dir) => {
      val lined = sixTokenLined(s, dir)
      // maxMapSize sized for the sf0.1 line stream: the operator's
      // vacuous-guarantee guard FIRED at the 2^14 default there (sketch
      // maxError reached the doc-frequency threshold) — exactly the loud
      // failure it exists for; 2^18 holds the error at 0 for this corpus
      // family (4 MB of sketch per partition — nothing, vs the exact
      // mine's full distinct-line shuffle)
      val stops = Dedup.boilerplateLinesSketch(lined, "doc_id", "text_lined",
        minDocFreq = 3, maxMapSize = 1 << 18)
      Dedup.stopLineFilter(lined, "doc_id", "text_lined", stops.select("key"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- corpus curation: deterministic stratified sampling ---------------
    // Sampling is a pure function of doc_id (multiplicative hash), not an
    // RNG — the same subset selects on any cluster size / partitioning,
    // which is what makes a 100 TB sampled corpus reproducible.
    "q_sample_stratified" -> ((s, dir) =>
      Corpus.stratifiedSample(t(s, dir, "documents"), "doc_id", "source",
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.125)
        .select("doc_id", "source")
        .orderBy("doc_id")),

    // --- temperature-based mixture sampling (Lample & Conneau 2019) -------
    // alpha = 0.5 flattens the lang mixture toward uniform (en is ~42%
    // of this corpus; tails upsample relative to it). Rates derive from
    // integerized sqrt weights in a fixed IEEE evaluation order, so the
    // DuckDB oracle recomputes the exact same per-stratum thresholds.
    "q_temperature_sample" -> ((s, dir) =>
      Corpus.temperatureSample(t(s, dir, "documents"), "doc_id", "lang",
        alpha = 0.5, targetRows = 250)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // --- corpus curation: PII redaction -----------------------------------
    // The synthetic corpus carries no PII, so the query plants one email,
    // phone, and URL per row (derived from doc_id) and then redacts —
    // exercising the regex surface genuinely on both engines.
    "q_pii_redact" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("dirty", concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail"), pmod(col("doc_id"), lit(7)).cast("string"), lit(".com or 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" see https://ex"), pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".org/d/"), col("doc_id").cast("string")))
        .select(col("doc_id"), Corpus.redactPii(col("dirty")).as("clean"),
          Corpus.piiCounts(col("dirty"))._1.as("n_email"),
          Corpus.piiCounts(col("dirty"))._2.as("n_phone"),
          Corpus.piiCounts(col("dirty"))._3.as("n_url"))
        .orderBy("doc_id")),

    // --- corpus curation: benchmark decontamination -----------------------
    // Benchmark = every 97th document (stand-in eval set); flag docs
    // sharing any distinct 4-gram with it. Benchmark grams broadcast.
    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.contamination(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(97)) === 0),
        "doc_id", "text", n = 4, minShared = 1)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- Bloom-served decontamination (the benchmark-too-big regime) ------
    // Same flags as q_decontaminate, served through the distributed-built
    // Bloom gram filter instead of the broadcast exact gram set: the
    // benchmark contributes only the filter bytes, so the plan holds
    // at ANY benchmark size. Oracled against the same exact-join SQL:
    // Bloom error is one-sided (no false negatives ever) and the filter
    // is SIZED FROM THE MEASURED gram count with a 2²⁴-bit floor (see
    // buildGramBloomSized: Spark's 32-bit double hashing floors small
    // filters' fp near 10⁻⁵, so the floor, not the ratio, carries the
    // margin), keeping the expected false-positive count ≪ 1 across
    // the corpus gram set at any sf — the flagged set IS the exact
    // contamination set (the guaranteed superset property — the
    // operator's contract — is what BloomSpec and PipelineSpec assert).
    "q_bloom_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Bloom.contaminationBloom(
        docs.filter(pmod(col("doc_id"), lit(97)) =!= 0), "doc_id", "text",
        benchGramBloom(s, dir), n = 4, minShared = 1)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // --- language ID, oracle-checked --------------------------------------
    // The full stopword-marker heuristic (TextOps.langIdHeuristic) is
    // re-expressed relationally in the DuckDB oracle: per-language marker
    // counts + argmax with the same (count, lang) tie-break. The CJK /
    // Cyrillic script fast paths are vacuous on this ASCII corpus.
    "q_lang_id" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextOps.langId(col("text")).as("lang"))
        .orderBy("doc_id")),

    // --- corpus curation: per-source token budget (training-mix fill) -----
    "q_token_budget" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.tokenCountWs(col("text")).cast("long").as("n_tok"))
      Corpus.tokenBudget(docs, "doc_id", "source", "n_tok", budget = 2000L)
        .orderBy("doc_id")
    }),

    // --- corpus curation: deterministic train/val/test split --------------
    // (hash-banded membership — a document can never migrate between
    // splits across runs; oracle recomputes the same integer thresholds)
    "q_split_assign" -> ((s, dir) =>
      Corpus.assignSplits(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id")),

    // --- corpus curation: exact-count per-stratum carve-out ---------------
    "q_take_per_stratum" -> ((s, dir) =>
      Corpus.takePerStratum(
        t(s, dir, "documents").select("doc_id", "source"),
        "doc_id", "source", n = 10)
        .orderBy("doc_id")),

    // --- corpus curation: sequence-packing plan (concat-then-chunk) -------
    // (fixed 512-token training sequences per stratum in deterministic
    // hash-shuffle order; all-integer window cumsum, oracle-recomputable)
    "q_seq_packing" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextOps.tokenCountWs(col("text")).cast("long").as("n_tok"))
      Corpus.packSequences(docs, "doc_id", "source", "n_tok", seqLen = 512L)
        .orderBy("doc_id")
    }),

    // --- corpus curation: intra-doc repetition profile --------------------
    "q_repetition" -> ((s, dir) =>
      Corpus.repetitionStats(t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    // --- boilerplate mining: corpus-wide top n-grams by doc frequency -----
    // The list a stop-line / boilerplate filter is seeded from. Top-k is
    // TakeOrderedAndProject over the gram->doc-frequency aggregate (slim
    // keys, partial agg map-side); ties break on the gram text so the
    // cut is deterministic in both engines.
    "q_boilerplate_grams" -> ((s, dir) =>
      Corpus.distinctGrams(t(s, dir, "documents"), "doc_id", "text", 3)
        .groupBy("gram").agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("gram"))
        .limit(20)),

    // --- n-gram repetition profile (Gopher's dup/top n-gram fractions) ----
    // Integer numerators only — the dup-fraction and dominance filters
    // derive from (total, n_distinct, top_cnt) without float rounding.
    "q_ngram_repetition" -> ((s, dir) =>
      Corpus.ngramRepetition(t(s, dir, "documents"), "doc_id", "text",
        ns = Seq(2, 3))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "n")),

    // --- multimodal binary columns (north star) ---------------------------
    "q_multimodal_bytes" -> ((s, dir) =>
      Multimodal.byteStats(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")),

    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.withMediaColumn(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .orderBy("media_id")),

    // --- file-format breadth: ORC + CSV round-trip, driver-checked --------
    // (the reference ingests only JSON-on-Kafka; a general engine must
    // round-trip columnar and text formats without loss — aggregate
    // equality against the source table proves fidelity)
    "q_formats_roundtrip" -> ((s, dir) => {
      val base = t(s, dir, "documents").select("doc_id", "source", "n_chars")
      val root = fmtDir(s)
      base.write.mode("overwrite").orc(s"$root/orc")
      base.write.mode("overwrite").option("header", "true").csv(s"$root/csv")
      val orc = s.read.orc(s"$root/orc")
      val csv = s.read.schema(base.schema).option("header", "true").csv(s"$root/csv")
      orc.withColumn("format", lit("orc"))
        .unionByName(csv.withColumn("format", lit("csv")))
        .groupBy("format")
        .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("format")
    }),

    // --- multimodal resize + frame sampling (stub codec, real plumbing) ---
    "q_multimodal_resize" -> ((s, dir) =>
      Multimodal.resize(
        Multimodal.withMediaColumn(t(s, dir, "documents"), "doc_id", "text"), 16, 16)
        .toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          length(col("bytes")).cast("int").as("n_out"))
        .orderBy("media_id")),

    // frame geometry is pure arithmetic over the byte length, so the
    // sampled (idx, len) set has an exact DuckDB twin — a REAL oracle for
    // the video-sampling shape, not just a pinned boolean
    "q_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.withMediaColumn(t(s, dir, "documents"), "doc_id", "text"),
        frameSize = 256, stride = 4)
        .toDF()
        .orderBy("media_id", "frame_idx")),

    // --- pure-SQL surface: extension-registered functions + temp views ----
    "q_sql_topk" -> ((s, dir) => {
      Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      // (ids, rank) projection only — no raw float score in driver-facing
      // output (see q_vector_topk)
      s.sql("""
        SELECT query_id, match_id, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY dot_product(q.embedding, c.embedding) DESC, c.vec_id) AS rank
          FROM embeddings q CROSS JOIN embeddings c)
        WHERE rank <= 3 ORDER BY query_id, rank""")
    }),

    "q_sql_topk_agg" -> ((s, dir) => {
      Tables(s, dir, "embeddings").createOrReplaceTempView("embeddings")
      // score is computed in the inner SELECT (codegen'd projection), not
      // inside the aggregate call — a TypedImperativeAggregate evaluates
      // its input expressions interpreted, per row. matches is best-first
      // with ties broken by lower id, so pos+1 == row_number rank.
      s.sql("""
        SELECT query_id, m.id AS match_id, CAST(pos + 1 AS INT) AS rank
        FROM (
          SELECT query_id, top_k_by_score(match_id, score, 3) AS matches
          FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                   dot_product(q.embedding, c.embedding) AS score
            FROM embeddings q CROSS JOIN embeddings c)
          GROUP BY query_id)
        LATERAL VIEW posexplode(matches) AS pos, m
        ORDER BY query_id, rank""")
    }),

  )
}
