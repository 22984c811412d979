package graft.tools

import graft.core._
import graft.fixtures.PagesGen
import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** Trains the LE / RR / DM logistic heads on the synthetic GT corpus —
  * the re-expression of the reference's training path
  * (run_training_test.bash:49-63: `ocrd-cis-train` fits the Weka models
  * and asserts model.zip exists; aio/aio.py:503-537 for the LE→RR/DM
  * order). Writes the classpath model resource `graft/model.txt`.
  *
  * Labeled examples come from the ENGINE's own extract+align path zipped
  * against golden lines; labels are word-parallel truth comparisons.
  * Heads are fit in the reference's dependency order: RR first (candidate
  * ranking), then DM (its features read RR scores), LE independently
  * (profiler-order features). Fitting is full-batch gradient descent on
  * standardized features (sorted examples → order-independent,
  * bit-reproducible), then weights are unfolded back to raw feature space.
  *
  * Usage: runMain graft.tools.Train [outPath] [nTrain] [nValidate]
  */
object Train {

  final case class Fit(w: Array[Double], bias: Double)

  /** Deterministic full-batch logistic regression with internal
    * standardization; returns weights in RAW feature space.
    */
  def fitLogistic(xs: Array[Array[Double]], ys: Array[Double],
      epochs: Int = 4000, lr: Double = 0.5, l2: Double = 1e-6): Fit = {
    val n = xs.length
    require(n > 0, "no training examples")
    val d = xs(0).length
    // standardize
    val mean = new Array[Double](d); val std = new Array[Double](d)
    var i = 0
    while (i < n) { var j = 0; while (j < d) { mean(j) += xs(i)(j); j += 1 }; i += 1 }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    i = 0
    while (i < n) {
      var k = 0
      while (k < d) { val v = xs(i)(k) - mean(k); std(k) += v * v; k += 1 }
      i += 1
    }
    j = 0
    while (j < d) { std(j) = math.sqrt(std(j) / n); if (std(j) < 1e-12) std(j) = 1.0; j += 1 }
    val z = Array.tabulate(n, d)((i, j) => (xs(i)(j) - mean(j)) / std(j))

    val w = new Array[Double](d); var b = 0.0
    var e = 0
    while (e < epochs) {
      val gw = new Array[Double](d); var gb = 0.0
      i = 0
      while (i < n) {
        var s = b; var k = 0
        while (k < d) { s += w(k) * z(i)(k); k += 1 }
        val err = 1.0 / (1.0 + math.exp(-s)) - ys(i)
        k = 0
        while (k < d) { gw(k) += err * z(i)(k); k += 1 }
        gb += err
        i += 1
      }
      var k = 0
      while (k < d) { w(k) -= lr * (gw(k) / n + l2 * w(k)); k += 1 }
      b -= lr * gb / n
      e += 1
    }
    // unfold standardization: s = b + sum w_k (x_k - mean_k)/std_k
    val raw = Array.tabulate(d)(k => w(k) / std(k))
    val rawB = b - (0 until d).map(k => w(k) * mean(k) / std(k)).sum
    Fit(raw, rawB)
  }

  /** One labeled token occurrence routed through the engine. */
  final case class TokenEx(
      ctx: Corrector.TokenCtx, truth: String, lang: String)

  /** All labeled token contexts of the training corpus, via
    * segment → align zipped against golden lines.
    */
  def tokenExamples(spark: SparkSession, n: Long): Array[TokenEx] = {
    import spark.implicits._
    val aligned = Pipeline.align(Pipeline.segment(Pipeline.generate(spark, n)))
    aligned.flatMap { ap =>
      val i = ap.url.substring(ap.url.lastIndexOf('p') + 1).toLong
      val golden = PagesGen.page(i).trueText.split("\n")
      ap.lines.zip(golden.toSeq).flatMap { case (line, gLine) =>
        val master = line.variants.head
        val tokens = master.text.split(" ", -1).toIndexedSeq
        val gTokens = gLine.split(" ", -1).toIndexedSeq
        val lineOverlap = line.variants.drop(1).map { v =>
          val mx = math.max(master.text.length, v.text.length).max(1)
          1.0 - Edist.levenshtein(master.text, v.text).toDouble / mx
        }.maxOption.getOrElse(1.0)
        val wordByIdx = line.words.zipWithIndex.map { case (w, k) => k -> w }.toMap
        tokens.zipWithIndex.flatMap { case (tok, k) =>
          val word = wordByIdx.get(k)
          val linePos = if (tokens.length <= 1) 0.0 else k.toDouble / (tokens.length - 1)
          val truth = gTokens.lift(k).getOrElse("")
            .dropWhile(!_.isLetterOrDigit).reverse.dropWhile(!_.isLetterOrDigit)
            .reverse.toLowerCase
          Corrector.contextOf(tok,
            word.map(_.variants.drop(1).map(_.text)).getOrElse(Nil),
            word.map(_.variants.head.conf).getOrElse(master.conf),
            word.map(_.glyphConfs).getOrElse(Nil), linePos, lineOverlap)
            .map(t => TokenEx(t, truth, ap.lang))
        }
      }
    }.collect()
      // order-independence: sort before any summation
      .sortBy(ex => (ex.ctx.token, ex.ctx.raw, ex.truth, ex.lang,
        ex.ctx.linePos, ex.ctx.conf))
  }

  def train(spark: SparkSession, n: Long): TrainedModel = {
    val profile = Pipeline.learnProfile(spark, n)
    val lexs = Map(
      "de" -> Pipeline.lexiconWith("de", profile),
      "en" -> Pipeline.lexiconWith("en", profile))
    val exs = tokenExamples(spark, n)

    // ---- RR: per (token, candidate), label = candidate IS the truth ----
    val rrX = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val rrY = scala.collection.mutable.ArrayBuffer[Double]()
    // ---- LE: per OOV token, label = token IS the truth (valid word) ----
    val leX = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val leY = scala.collection.mutable.ArrayBuffer[Double]()
    exs.foreach { ex =>
      val lex = lexs(ex.lang)
      val cands = Profiler.candidates(ex.ctx.token, lex)
      cands.foreach { c =>
        rrX += Corrector.rrFeatures(ex.ctx, c, lex)
        rrY += (if (c.suggestion == ex.truth) 1.0 else 0.0)
      }
      if (!lex.contains(ex.ctx.token)) {
        leX += Corrector.leFeatures(ex.ctx, cands, lex)
        leY += (if (ex.ctx.token == ex.truth) 1.0 else 0.0)
      }
    }
    val rr = fitLogistic(rrX.toArray, rrY.toArray)
    val le = fitLogistic(leX.toArray, leY.toArray)

    // ---- DM: features read the TRAINED RR scores (reference order).
    // Only LE-REJECTED tokens are DM examples — at inference the LE gate
    // runs first, so tokens it protects never reach the DM; training the
    // DM on them teaches it to veto legitimate corrections that share
    // surface features with entities (capitalized line starts). ----
    def rrScore(t: Corrector.TokenCtx, c: Candidate, lex: Lexicon): Double =
      Corrector.sigmoid(Corrector.dot(Corrector.rrFeatures(t, c, lex), rr.w, rr.bias))
    def leAccepts(t: Corrector.TokenCtx, cands: Seq[Candidate], lex: Lexicon): Boolean =
      Corrector.sigmoid(Corrector.dot(Corrector.leFeatures(t, cands, lex), le.w, le.bias)) > 0.5
    val dmX = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val dmY = scala.collection.mutable.ArrayBuffer[Double]()
    exs.foreach { ex =>
      val lex = lexs(ex.lang)
      if (!lex.contains(ex.ctx.token) && {
        val cands = Profiler.candidates(ex.ctx.token, lex)
        !leAccepts(ex.ctx, cands, lex)
      }) {
        val cands = Profiler.candidates(ex.ctx.token, lex)
        val ranked = cands.map(c => (c, rrScore(ex.ctx, c, lex)))
          .sortBy { case (c, s) => (-s, c.suggestion) }
          .zipWithIndex.map { case ((c, s), k) => Corrector.Ranked(c, s, k + 1) }
        if (ranked.nonEmpty && ranked.head.candidate.suggestion != ex.ctx.token) {
          dmX += Corrector.dmFeatures(ranked)
          dmY += (if (ranked.head.candidate.suggestion == ex.truth &&
            ex.ctx.token != ex.truth) 1.0 else 0.0)
        }
      }
    }
    val dm = fitLogistic(dmX.toArray, dmY.toArray)

    println(s"[train] rr=${rrX.length} examples, le=${leX.length}, dm=${dmX.length}")
    TrainedModel(rr.w, rr.bias, dm.w, dm.bias, le.w, le.bias)
  }

  /** Validate: corrected output must be byte-identical to golden on the
    * held-out range [from, to). Returns mismatching urls.
    */
  def validate(spark: SparkSession, from: Long, to: Long): Seq[String] = {
    import spark.implicits._
    val out = Pipeline.run(
      spark.range(from, to).map(i => PagesGen.page(i).row))
      .map(c => (c.url, c.text)).collect().toMap
    (from until to).flatMap { i =>
      val tp = PagesGen.page(i)
      if (out(tp.row.url) != tp.trueText) Some(tp.row.url) else None
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("src/main/resources/graft/model.txt")
    val nTrain = args.lift(1).map(_.toLong).getOrElse(300L)
    val nVal = args.lift(2).map(_.toLong).getOrElse(200L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val model = train(spark, nTrain)
    Corrector.modelOverride = Some(model) // validate with the fresh weights
    val bad = validate(spark, nTrain, nTrain + nVal)
    println(s"[train] validation: ${nVal - bad.length}/$nVal pages byte-identical")
    if (bad.nonEmpty) {
      bad.take(5).foreach(u => println(s"[train] MISMATCH $u"))
      sys.exit(1)
    }
    val path = java.nio.file.Paths.get(out)
    if (path.getParent != null) java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, TrainedModel.render(model,
      s"trained by graft.tools.Train (n=$nTrain synthetic GT pages, seed 42); " +
        s"validated byte-identical on ${nVal} held-out pages"))
    println(s"[train] wrote $out")
    spark.stop()
  }
}
