package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SparkSessionExtensions entry point registering graft's native
  * expressions as SQL functions, so pure-SQL users get the codegen vector
  * ops too:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
  *     ...
  *   spark.sql("SELECT graft_cosine(a.vec, b.vec) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_split"),
      new ExpressionInfo(classOf[Md5Split].getName, "graft_md5_split"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_md5_split takes exactly 1 argument, got ${children.size}")
        Md5Split(children.head)
      }))
    // Catalyst's runtime-filter bloom machinery, exposed for EXPLICIT
    // semi-join reduction: build a compact bloom over a filtered dim's
    // hashed keys, probe it map-side on the fact scan before the join
    // shuffle. Same classes AQE's InjectRuntimeFilter instantiates — only
    // the registration is ours.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => new BloomFilterAggregate(c)
        case Seq(c, n) => new BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
        case other => throw new IllegalArgumentException(
          s"graft_bloom_agg takes 1-3 arguments, got ${other.size}")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_might_contain takes exactly 2 arguments, got ${children.size}")
        BloomFilterMightContain(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingle_md5"),
      new ExpressionInfo(classOf[ShingleMd5].getName, "graft_shingle_md5"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_shingle_md5 takes exactly 2 arguments, got ${children.size}")
        ShingleMd5(children(0), children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_extract_hrefs"),
      new ExpressionInfo(classOf[ExtractHrefs].getName, "graft_extract_hrefs"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"graft_extract_hrefs takes exactly 1 argument, got ${children.size}")
        ExtractHrefs(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"graft_zorder takes exactly 2 arguments, got ${children.size}")
        ZOrder2(children(0), children(1))
      }))
    // rank-1 window filters → max_by/min_by aggregates (no per-partition
    // sort; map-side partial combine) — see graft.plans.RewriteRankOneToMaxBy
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankOneToMaxBy)
    // whole-operator extension: TopKPerKey logical node → two-phase
    // bounded-heap physical plan (see graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
