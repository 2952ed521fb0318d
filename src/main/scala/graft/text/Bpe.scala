package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding MERGE LEARNING — the training step that produces the
  * vocab [[graft.functions.Subword.subwordStatsVocab]] consumes (q184 loads
  * a vocab; q185 learns one). Standard BPE (Sennrich et al. 2016, public):
  * start from words split into characters; each round, count adjacent
  * symbol pairs weighted by word frequency, merge the most frequent pair
  * everywhere (left-to-right, non-overlapping within a word), repeat.
  *
  * Scale shape: the corpus collapses to its unique-word frequency table
  * FIRST (one shuffle on word — at 100 TB the word table is vocabulary-
  * sized, orders of magnitude smaller than the corpus), and every round
  * rides that compacted table: one pair-count aggregation plus a 1-row
  * driver collect (the argmax pair — bounded model state, the k-means
  * pattern). Rounds are inherently sequential (each merge changes the next
  * round's pair counts — that is BPE's definition, not an implementation
  * choice). The per-round HOF pair enumeration is interpreted per element,
  * acceptable on the compacted table; the merge APPLICATION is the native
  * [[graft.functions.BpeMergeExpr]] kernel.
  *
  * Training is restricted to purely-ASCII-lowercase words so pair
  * tie-breaks (count DESC, left ASC, right ASC) order identically across
  * engines (binary vs locale collation can differ on non-ASCII — the
  * oracle replays the same rounds in DuckDB SQL). */
object Bpe {

  /** One learned merge: round (1-based), the pair, its support count. */
  final case class Merge(round: Int, left: String, right: String, cnt: Long)

  /** The unique-word frequency table BPE trains on: space-split tokens of
    * `textCol`, ASCII-lowercase-only (see class doc), weighted by
    * occurrence count. */
  def wordTable(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(split(textCol, " ")).as("word"))
      // \A..\z, not ^..$: Java's $ also matches BEFORE a trailing newline,
      // so "bar\n" would train here but fail the oracle's RE2 $ (end of
      // text only) — and '\n' would become a symbol, breaking the
      // ASCII-only tie-break invariant
      .where(col("word").rlike("\\A[a-z]+\\z"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `rounds` merges from the word table. Driver state per round is
    * ONE row (the argmax pair); the returned merge list is the model. */
  def train(words: DataFrame, rounds: Int): Seq[Merge] = {
    require(rounds >= 1 && rounds <= 4096,
      s"rounds=$rounds out of range: each BPE round is a word-table pass + " +
        "one driver round-trip, measured FLAT per round out to 1024 rounds " +
        "on a 3·10^4-word vocabulary (BASELINE.md round-cost curve, r15) — " +
        "the 4096 guard is a runaway-loop backstop, not a cost cliff; at " +
        "tokenizer scale (32k merges) batch merges per pass")
    var seqs = words.select(col("cnt"),
      expr("transform(sequence(1, char_length(word)), i -> substring(word, i, 1))")
        .as("syms"))
      .localCheckpoint() // both consumers below read the materialized blocks
    // the checkpointed frame currently holding blocks — released
    // DETERMINISTICALLY when superseded or on exit (advisor r14 #5: leaving
    // superseded checkpoint RDDs to driver-GC/ContextCleaner made memory
    // pressure in a 200+-query session nondeterministic, and
    // spark.catalog.clearCache() does not clear checkpoint blocks)
    var liveCp = seqs
    val merges = Seq.newBuilder[Merge]
    try {
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
        // pair enumeration stays the transform/element_at HOF DELIBERATELY
        // (optimization r18 A/B): the builtin slice+arrays_zip rewrite
        // (no interpreted lambda) measured ~10% SLOWER per round at sf0.1
        // (q211 4.33→4.80 s, q185/q186/q191 +0.1 s each — the two slice
        // array copies cost more than the lambda) and only ~4% faster at
        // sf1 (7.3→7.0 s), so the interpreted HOF is the right per-round
        // kernel at both scales measured
        val best = seqs.where(size(col("syms")) >= 2)
          .select(col("cnt"), explode(expr(
            "transform(sequence(1, size(syms) - 1), " +
              "i -> struct(element_at(syms, i) as l, element_at(syms, i + 1) as r))"))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("cnt")).as("c"))
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        if (best.isEmpty) exhausted = true // every word is one symbol
        else {
          val (l, rr, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
          merges += Merge(r, l, rr, c)
          // localCheckpoint every CHECKPOINT_EVERY rounds, not persist
          // every round: a persist chain keeps the FULL logical lineage,
          // so round r pays Catalyst analysis over r nested merge
          // expressions — O(rounds²) planning that measured 3.3 s/round
          // by round 64 (r14). The periodic checkpoint bounds the lineage
          // at ≤ 8 kernel applications (constant planning; the argmax
          // pass recomputes at most 7 cheap merges over the compacted
          // word table between checkpoints — the knob trades that
          // recompute against one materialization job per round, worth it
          // even at a 10^7-row word table since the merge kernel is a
          // narrow codegen'd map). The superseded checkpoint's blocks are
          // released EXPLICITLY once the new one has materialized (the
          // eager localCheckpoint call returns only after its blocks
          // exist, so nothing can still need the old ones).
          val next = seqs.select(col("cnt"),
            graft.functions.BpeMerge.bpeMerge(col("syms"), l, rr).as("syms"))
          if (r % 8 == 0) {
            val cp = next.localCheckpoint()
            unpersistCheckpoint(liveCp)
            liveCp = cp
            seqs = cp
          } else seqs = next
          r += 1
      }
    }
    } finally unpersistCheckpoint(liveCp)
    merges.result()
  }

  /** Release a localCheckpoint'd frame's cached RDD blocks. The checkpoint
    * lives as the `rdd` of the frame's LogicalRDD leaf; a frame of any
    * other shape (never produced here) is a silent no-op rather than an
    * error — cleanup must not fail training. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** [[train]] that REQUIRES all `rounds` merges to exist (advisor r11 #2):
    * the generated DuckDB oracles replay exactly `rounds` merges, so a
    * corpus that exhausts early must fail HERE, loudly, instead of the
    * Spark side silently applying fewer merges than the oracle text
    * assumes. Callers whose oracle interpolates `rounds` merge rounds
    * (q186 apply, q191 vocab-export) use this; q185's train oracle is
    * exhaustion-consistent (an empty b_r yields no row on both sides) and
    * keeps plain [[train]]. */
  def trainFull(words: DataFrame, rounds: Int): Seq[Merge] = {
    val m = train(words, rounds)
    require(m.length == rounds,
      s"BPE training exhausted after ${m.length} of $rounds rounds: the " +
        "generated oracle replays exactly the requested rounds and would diverge")
    m
  }

  /** The q185 oracle: the same `rounds` BPE rounds as chained DuckDB CTEs.
    * Merge application is non-overlapping left-to-right string replace over
    * ()-delimited symbols — "(a)(a)(a)" under (a,a) → "(aa)(a)", exactly
    * [[graft.functions.BpeMergeExpr]]'s rule (delimiters are safe: training
    * symbols are [a-z]+ by construction, so '(' / ')' never occur inside a
    * symbol). Pair counts CAST to BIGINT (DuckDB sum() yields HUGEINT,
    * which the driver's type guard bans). */
  def oracleSql(rounds: Int): String =
    trainingCtes(rounds) + "\n" + (1 to rounds).map(r =>
      s"SELECT $r AS round, l AS merge_l, r AS merge_r, CAST(c AS BIGINT) AS cnt FROM b$r")
      .mkString("SELECT * FROM (\n", "\nUNION ALL ", ")\nORDER BY round")

  /** The q186 oracle: replay training (the same CTEs as [[oracleSql]]) then
    * APPLY the learned merges in order to every word INSTANCE — one
    * non-overlapping delimited replace per round — and aggregate per doc.
    * The Spark side trains via [[trainFull]], so an early-exhausted corpus
    * fails loudly there; belt-and-braces, every scalar subquery here is
    * additionally coalesce-guarded with chr(1) (a byte that never occurs
    * in ()-delimited [a-z]+ symbols) so an exhausted b{r} makes the
    * replace a NO-OP instead of NULL-poisoning every row (advisor r11 #2). */
  def applyOracleSql(rounds: Int): String = {
    val app = new StringBuilder
    app.append(s""",
      |wi AS (
      |  SELECT doc_id, word FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t
      |  WHERE regexp_matches(word, '^[a-z]+$$')),
      |a0 AS (
      |  SELECT doc_id, '(' || array_to_string(list_transform(range(1, len(word) + 1),
      |    i -> substring(word, CAST(i AS INT), 1)), ')(') || ')' AS s FROM wi)""".stripMargin)
    for (r <- 1 to rounds) app.append(s""",
      |a$r AS (
      |  SELECT doc_id, replace(s,
      |    '(' || coalesce((SELECT l FROM b$r), chr(1)) || ')(' || coalesce((SELECT r FROM b$r), chr(1)) || ')',
      |    '(' || coalesce((SELECT l FROM b$r), chr(1)) || coalesce((SELECT r FROM b$r), chr(1)) || ')') AS s FROM a${r - 1})""".stripMargin)
    app.append(s""",
      |cnts AS (
      |  SELECT doc_id, len(regexp_extract_all(s, '\\(([a-z]+)\\)')) AS n
      |  FROM a$rounds)
      |SELECT d.doc_id,
      |  CAST(coalesce(count(cnts.n), 0) AS BIGINT) AS n_words,
      |  CAST(coalesce(sum(cnts.n), 0) AS BIGINT) AS n_bpe_tokens
      |FROM documents d LEFT JOIN cnts USING (doc_id)
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)
    trainingCtes(rounds) + app.result()
  }

  /** The q191 oracle — the CLOSED BPE loop (judge r11, Next #3): replay
    * training (the same CTEs as [[oracleSql]]), EXPORT the trained
    * vocabulary (the merged symbols b1..b{rounds} plus the a-z base
    * charset), then segment every word instance with q178's greedy
    * longest-prefix recursive-CTE walk against that vocabulary and roll up
    * per doc. This is the vocabulary the Spark side feeds to
    * [[graft.functions.Subword.subwordStatsVocab]] — the vocab the counter
    * consumes IS the trained BPE vocabulary. Duplicate units (a later
    * round can re-derive an earlier merge string via a different split)
    * are harmless under the walk's max(len(unit)) probe. */
  def segmentOracleSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(trainingCtes(rounds, recursive = true))
    sb.append(s""",
      |units(unit) AS (
      |  ${(1 to rounds).map(r => s"SELECT l || r AS unit FROM b$r").mkString("\n  UNION ALL ")}
      |  UNION ALL SELECT chr(96 + CAST(x AS INT)) FROM range(1, 27) t(x)),
      |wi AS (
      |  SELECT doc_id, i, wrd[i] AS word FROM (
      |    SELECT doc_id, wrd, generate_subscripts(wrd, 1) AS i FROM
      |      (SELECT doc_id, string_split(text, ' ') AS wrd FROM documents) t0) t
      |  WHERE wrd[i] <> ''),
      |seg AS (
      |  SELECT doc_id, i, word, 1 AS pos, 0 AS n FROM wi
      |  UNION ALL
      |  SELECT doc_id, i, word,
      |    pos + coalesce((SELECT max(len(unit)) FROM units
      |                    WHERE unit = substr(word, pos, len(unit))), 1),
      |    n + 1
      |  FROM seg WHERE pos <= len(word)),
      |fin AS (SELECT doc_id, i, n FROM seg WHERE pos > len(word))
      |SELECT d.doc_id,
      |  CAST(coalesce(count(fin.i), 0) AS BIGINT) AS n_words,
      |  CAST(coalesce(sum(fin.n), 0) AS BIGINT) AS n_subwords
      |FROM documents d LEFT JOIN fin USING (doc_id)
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin)
    sb.result()
  }

  /** Shared train-replay CTE prefix: w (word table), s1..s{rounds}
    * (symbol sequences per round), p{r}/b{r} (pair counts / argmax).
    * `recursive = true` emits WITH RECURSIVE so a caller can chain a
    * recursive CTE (q191's greedy walk) onto the prefix.
    *
    * In the NON-recursive form every round CTE is AS MATERIALIZED: each
    * s{r} is referenced twice (p{r} and s{r+1}) and each b{r} four times
    * (the s{r+1} scalar subqueries) — DuckDB's default CTE INLINING
    * re-expands those references, which at 5 rounds is waste and at
    * q211's 64 rounds is an exponential plan that exhausts file handles
    * before it exhausts time (r14 measurement: 64 inlined rounds died on
    * fd limits; materialized, the full replay runs in seconds). The
    * RECURSIVE form (q191) stays inlined: DuckDB 1.0.0 mis-evaluates the
    * recursive greedy-walk's correlated scalar subquery when upstream
    * CTEs are materialized (r14 measurement: identical trained units,
    * yet 91→94 subwords on doc 0 — matches silently missed inside the
    * recursion), and q191's 5-round prefix is cheap inlined. */
  private def trainingCtes(rounds: Int, recursive: Boolean = false): String = {
    val matKw = if (recursive) "" else "MATERIALIZED "
    val cte = new StringBuilder
    cte.append(if (recursive) "WITH RECURSIVE " else "WITH ")
    cte.append(
      s"""w AS ${matKw}(
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word),
        |s1 AS ${matKw}(
        |  SELECT cnt, list_transform(range(1, len(word) + 1),
        |    i -> substring(word, CAST(i AS INT), 1)) AS syms FROM w)""".stripMargin)
    for (r <- 1 to rounds) {
      cte.append(s""",
        |p$r AS ${matKw}(
        |  SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT) + 1] AS r,
        |    sum(cnt) AS c
        |  FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i FROM s$r) t
        |  GROUP BY 1, 2),
        |b$r AS ${matKw}(SELECT l, r, c FROM p$r ORDER BY c DESC, l ASC, r ASC LIMIT 1)""".stripMargin)
      if (r < rounds) cte.append(s""",
        |s${r + 1} AS ${matKw}(
        |  SELECT cnt, regexp_extract_all(
        |    replace('(' || array_to_string(syms, ')(') || ')',
        |      '(' || coalesce((SELECT l FROM b$r), chr(1)) || ')(' || coalesce((SELECT r FROM b$r), chr(1)) || ')',
        |      '(' || coalesce((SELECT l FROM b$r), chr(1)) || coalesce((SELECT r FROM b$r), chr(1)) || ')'),
        |    '\\(([a-z]+)\\)', 1) AS syms
        |  FROM s$r)""".stripMargin)
    }
    cte.result()
  }
}
