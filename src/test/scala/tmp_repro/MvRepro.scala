import graft.core._
object MvRepro {
  def main(args: Array[String]): Unit = {
    var bad = 0
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(777L * seed)
      for (it <- 1 to 500) {
        def ring(nv: Int, span: Int, ox: Int, oy: Int): String = {
          val pts = (1 to nv).map(_ => ((ox + rnd.nextInt(span)).toDouble, (oy + rnd.nextInt(span)).toDouble))
          (pts :+ pts.head).map { case (x, y) => s"$x $y" }.mkString(",")
        }
        val nRings = 1 + rnd.nextInt(3)
        val rs = (1 to nRings).map(_ => s"(${ring(4 + rnd.nextInt(5), 20, rnd.nextInt(8), rnd.nextInt(8))})").mkString(",")
        val w = if (rnd.nextBoolean()) s"POLYGON($rs)"
                else s"MULTIPOLYGON(${(1 to 2).map(_ => s"((${ring(5, 15, rnd.nextInt(10), rnd.nextInt(10))}))").mkString(",")})"
        val in = Wkt.parse(w)
        try {
          val out = SetOps.makeValid(in)
          if (!(out.isEmpty || Validate.isValid(out))) { bad += 1; println(s"INVALID[$seed/$it]: $w") }
          else if (Wkt.write(SetOps.makeValid(out)) != Wkt.write(out)) { bad += 1; println(s"NONIDEM[$seed/$it]: $w") }
        } catch { case e: Exception => bad += 1; println(s"THROW[$seed/$it]: $w : ${e.getMessage}") }
      }
    }
    println(s"done bad=$bad (3000 cases)")
  }
}
