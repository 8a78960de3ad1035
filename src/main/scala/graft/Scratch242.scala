package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for q242 (dev-only, deleted before round end). */
object Scratch242 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    import graft.operators.KMeans
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[scratch] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { it =>
      System.err.println(s"[scratch] === iter $it ===")
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      var cents = KMeans.KSweep.map(k =>
          e.filter(col("vec_id") < k)
            .select(lit(k.toLong).as("kk"), col("vec_id").as("cluster"),
              col("v").as("cv")))
        .reduce(_ unionAll _)
      cents = t("seed checkpoint")(cents.localCheckpoint())
      val wa = Window.partitionBy("kk", "vec_id")
        .orderBy(asc("dist"), asc("cluster"))
      def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x)
      def assignTagged(c: org.apache.spark.sql.DataFrame) =
        e.crossJoin(broadcast(c))
          .select(col("kk"), col("vec_id"), col("v"), col("cluster"),
            round(sqDist(col("v"), col("cv")), 6).as("dist"))
          .withColumn("rk", row_number().over(wa))
          .filter(col("rk") === 1)
      (1 to KMeans.Iters).foreach { r =>
        val means = assignTagged(cents)
          .select(col("kk"), col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("kk", "cluster", "pos").agg(round(avg("x"), 6).as("m"))
          .groupBy("kk", "cluster")
          .agg(expr("transform(sort_array(collect_list(struct(pos, m))), p -> p.m)")
            .as("cv2"))
        cents = t(s"round $r")(cents.join(means, Seq("kk", "cluster"), "left")
          .select(col("kk"), col("cluster"),
            coalesce(col("cv2"), col("cv")).as("cv"))
          .localCheckpoint())
      }
      val members = t("final assign")(assignTagged(cents)
        .select(col("kk"), col("vec_id").as("n_id"), col("v").as("nv"),
          col("cluster"))
        .localCheckpoint())
      // variant A: min_by argmin instead of the rank window
      def assignMinBy(c: org.apache.spark.sql.DataFrame) =
        e.crossJoin(broadcast(c))
          .select(col("kk"), col("vec_id"), col("v"),
            struct(round(sqDist(col("v"), col("cv")), 6).as("dist"),
              col("cluster")).as("dc"))
          .groupBy("kk", "vec_id")
          .agg(min("dc").as("b"), first("v").as("v"))
          .select(col("kk"), col("vec_id"), col("v"),
            col("b.cluster").as("cluster"), col("b.dist").as("dist"))
      val m2 = t("final assign min_by")(assignMinBy(cents)
        .localCheckpoint())
      val diff = t("diff check")(m2.select("kk", "vec_id", "cluster")
        .exceptAll(members.select(col("kk"), col("n_id").as("vec_id"),
          col("cluster"))).count())
      System.err.println(s"[scratch] min_by diff rows = $diff")
      // variant C: codegen'd L2Dist expression + rank window
      def assignL2(c: org.apache.spark.sql.DataFrame) =
        e.crossJoin(broadcast(c))
          .select(col("kk"), col("vec_id"), col("v"), col("cluster"),
            round(graft.plans.L2Dist.sqDist(col("v"), col("cv")), 6).as("dist"))
          .withColumn("rk", row_number().over(wa))
          .filter(col("rk") === 1)
      val m3 = t("final assign L2Dist")(assignL2(cents).localCheckpoint())
      val diff3 = t("diff check L2Dist")(
        m3.select("kk", "vec_id", "cluster", "dist")
          .exceptAll(assignTagged(cents)
            .select("kk", "vec_id", "cluster", "dist")).count())
      System.err.println(s"[scratch] L2Dist diff rows = $diff3")
      t("full q242")(KMeans.q242KSweep(spark, dir).write.format("noop")
        .mode("overwrite").save())
    }
    spark.stop()
  }
}
