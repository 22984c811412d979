package graft.core

/** Trained logistic weights for the three ML heads (LE / RR / DM) — the
  * analog of the reference's shipped model.zip
  * (run_training_test.bash:49-63 trains it; postcorrect consumes it).
  * Produced by `graft.tools.Train` on the synthetic GT corpus and shipped
  * as the classpath resource `graft/model.txt`; rebuildable any time with
  * `sbt "runMain graft.tools.Train src/main/resources/graft/model.txt"`.
  */
final case class TrainedModel(
    rr: Array[Double], rrBias: Double,
    dm: Array[Double], dmBias: Double,
    le: Array[Double], leBias: Double)

object TrainedModel {

  val ResourcePath = "graft/model.txt"

  def parse(lines: Iterator[String]): TrainedModel = {
    val kv = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val Array(k, v) = l.split("=", 2)
        k.trim -> v.trim
      }.toMap
    def vec(k: String): Array[Double] = kv(k).split(",").map(_.toDouble)
    def num(k: String): Double = kv(k).toDouble
    TrainedModel(vec("rr"), num("rrBias"), vec("dm"), num("dmBias"),
      vec("le"), num("leBias"))
  }

  def render(m: TrainedModel, header: String): String = {
    def vec(a: Array[Double]): String = a.map(x => f"$x%.12g").mkString(",")
    s"""# $header
       |rrBias=${m.rrBias}
       |rr=${vec(m.rr)}
       |dmBias=${m.dmBias}
       |dm=${vec(m.dm)}
       |leBias=${m.leBias}
       |le=${vec(m.le)}
       |""".stripMargin
  }

  /** Loaded once per JVM from the classpath (broadcast-free: the model is
    * a few hundred bytes and rides the executor classpath like the
    * reference's model.zip rides the jar).
    */
  lazy val default: TrainedModel = {
    val in = Thread.currentThread().getContextClassLoader.getResourceAsStream(ResourcePath)
    require(in != null,
      s"missing trained model resource $ResourcePath — run graft.tools.Train")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }
}
