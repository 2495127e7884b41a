package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal, SessionWindow, TimeWindow}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.CalendarIntervalType
import org.apache.spark.unsafe.types.CalendarInterval

import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CountIn, MaxRun, MinHashSignature, VecCosineQ, VecDot}

/** Engine extension point, loaded via `spark.sql.extensions`.
  *
  * Mirrors the reference's external-function registry
  * (`/root/reference/qpmodel/ExprFunc.cs:42-76`) the Spark-first way:
  * native Catalyst expressions injected into the session's function
  * registry so both SQL text and `expr("vec_dot(...)")` resolve them, and
  * codegen keeps them inside WholeStageCodegen spans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Replicated-table distribution parity (see ReplicatedTableHints).
    ext.injectOptimizerRule(_ => new ReplicatedTableHints)

    // Scale-0 double ROUND -> primitive RoundQ (see FastRound): removes
    // the per-row BigDecimal from every qsum/dsum aggregate and from the
    // embedding quantizer, bit-identically.
    ext.injectOptimizerRule(_ => new FastRound)

    // Post-reorder optimizer rules (ContainmentJoinReorder,
    // ColumnGroupCertifiedBroadcast) must run AFTER CostBasedJoinReorder,
    // and the only batch there is `User Provided Optimizers` fed from
    // `experimental.extraOptimizations` — live-session state that
    // `newSession()` clones silently drop (the r14 footgun: harnesses
    // had to remember to re-register). Extensions DO carry to clones, so
    // this analyzer-side installer (Post-Hoc Resolution batch, runs on
    // every analysis) re-establishes the rules before the session's
    // first optimization: analysis completes before the optimizer's
    // batch list (a `def`) reads extraOptimizations, so even the very
    // first query on a bare clone plans with the full engine. Idempotent
    // per-rule and synchronized — see GraftSession.ensurePostReorderRules.
    ext.injectPostHocResolutionRule(new InstallPostReorderRules(_))

    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))

    ext.injectFunction((
      new FunctionIdentifier("vec_cosine_q"),
      new ExpressionInfo(classOf[VecCosineQ].getName, "vec_cosine_q"),
      (children: Seq[Expression]) => VecCosineQ(children(0), children(1))))

    // count_in(ws, 'a', 'b', ...): native one-pass membership counter —
    // bit-identical to size(filter(ws, w -> w IN (...))) whose lambda
    // runs interpreted (optimization r16). Terms must be string literals
    // (they are a fixed model parameter, never data).
    ext.injectFunction((
      new FunctionIdentifier("count_in"),
      new ExpressionInfo(classOf[CountIn].getName, "count_in"),
      (c: Seq[Expression]) => CountIn(c.head, c.tail.map {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"count_in terms must be string literals, got $other")
      })))

    // word_shingles(ws, n): native distinct space-joined word n-grams —
    // bit-identical to array_distinct(transform(sequence, concat(...)))
    // (optimization r16). n must be an int literal (a shape parameter).
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.functions.WordShingles].getName,
        "word_shingles"),
      (c: Seq[Expression]) => graft.functions.WordShingles(c.head, c(1) match {
        case Literal(n: Int, _) => n
        case other => throw new IllegalArgumentException(
          s"word_shingles n must be an int literal, got $other")
      })))

    // max_run(sorted array<string>): native longest-equal-run counter —
    // bit-identical to the Gopher-rule aggregate() fold it replaces
    // (optimization r16).
    ext.injectFunction((
      new FunctionIdentifier("max_run"),
      new ExpressionInfo(classOf[MaxRun].getName, "max_run"),
      (c: Seq[Expression]) => MaxRun(c.head)))

    // Catalyst's own runtime-filter machinery (SPARK-32268), surfaced as
    // user-callable functions: `bloom_agg(xxhash64(k) [, est_items
    // [, num_bits]])` builds an org.apache.spark.util.sketch.BloomFilter
    // with a distributed partial/final aggregate, and
    // `bloom_might_contain(filter, xxhash64(k))` probes it inside
    // WholeStageCodegen (the filter side must be a literal or a scalar
    // subquery — the same contract InjectRuntimeFilter relies on, which
    // makes the probe a per-row bitset test, never a per-row
    // deserialization). graft.operators.Bloom builds on these.
    ext.injectFunction((
      new FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "bloom_agg"),
      (c: Seq[Expression]) => c.size match {
        case 1 => new BloomFilterAggregate(c(0))
        case 2 => new BloomFilterAggregate(c(0), c(1))
        case _ => new BloomFilterAggregate(c(0), c(1), c(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (c: Seq[Expression]) => BloomFilterMightContain(c(0), c(1))))

    // Reference streaming-window SQL surface (`/root/reference/qpmodel/
    // Stream.cs:19-165`: tumble(ts, iv), hop(ts, slide, iv),
    // session(ts, gap) as GROUP BY keys) mapped onto Catalyst's native
    // window expressions — the TimeWindowing/SessionWindowing analyzer
    // rules expand them exactly like window()/session_window(), yielding
    // the grouped `window` / `session_window` struct columns.
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (c: Seq[Expression]) => MinHashSignature(c(0),
        c(1).eval().asInstanceOf[Int], c(2).eval().asInstanceOf[Int])))

    // Interval literals arrive as DayTimeIntervalType (long micros) or
    // CalendarIntervalType; TimeWindow's long-based constructor wants
    // plain microseconds and SessionWindow wants a CalendarInterval gap.
    def micros(e: Expression): Long = {
      require(e.foldable, s"window duration must be a literal, got $e")
      e.eval() match {
        case l: java.lang.Long => l
        case i: java.lang.Integer => i.toLong
        case ci: CalendarInterval =>
          require(ci.months == 0, "month-based window durations unsupported")
          ci.days * 86400000000L + ci.microseconds
        case other =>
          throw new IllegalArgumentException(s"bad window duration: $other")
      }
    }
    ext.injectFunction((
      new FunctionIdentifier("tumble"),
      new ExpressionInfo(classOf[TimeWindow].getName, "tumble"),
      (c: Seq[Expression]) =>
        new TimeWindow(c(0), micros(c(1)), micros(c(1)), 0L)))
    ext.injectFunction((
      new FunctionIdentifier("hop"),
      new ExpressionInfo(classOf[TimeWindow].getName, "hop"),
      (c: Seq[Expression]) =>
        new TimeWindow(c(0), micros(c(2)), micros(c(1)), 0L)))
    ext.injectFunction((
      new FunctionIdentifier("session"),
      new ExpressionInfo(classOf[SessionWindow].getName, "session"),
      (c: Seq[Expression]) => new SessionWindow(c(0),
        Literal(new CalendarInterval(0, 0, micros(c(1))), CalendarIntervalType))))
  }
}

/** Analyzer-side installer for the post-reorder optimizer rules (see
  * the injection comment in [[GraftExtensions]]): a no-op on the plan,
  * whose side effect keeps `experimental.extraOptimizations` complete
  * on every session the extensions reach — including `newSession()`
  * clones, which drop the live-session registration.
  */
class InstallPostReorderRules(session: org.apache.spark.sql.SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    graft.GraftSession.ensurePostReorderRules(session)
    plan
  }
}
