package graft

import org.scalatest.funsuite.AnyFunSuite

/** The operator catalog is the library's discoverable surface and the
  * README is generated from it — so the catalog itself needs a gate:
  * every oracle id it cites must be a real SparkEntry query, and every
  * entry point must resolve to a class that actually exists. Without
  * this, a renamed operator or retired query would leave the front
  * door pointing at nothing.
  */
class GraftCatalogSpec extends AnyFunSuite {

  test("every oracle gate the catalog cites exists in SparkEntry.queries") {
    val keys = SparkEntry.queries.keySet
    val cited = Graft.catalog
      .flatMap(o => "q\\d+".r.findAllIn(o.gate)).distinct
    assert(cited.nonEmpty)
    val missing = cited.filterNot(q => keys.exists(_.startsWith(q + "_")))
    assert(missing.isEmpty, s"catalog cites unknown gate queries: $missing")
  }

  test("every catalog entry point resolves to a real class or object") {
    def resolves(fqcn: String): Boolean =
      try { Class.forName(fqcn); true }
      catch {
        case _: ClassNotFoundException =>
          try { Class.forName(fqcn + "$"); true }
          catch { case _: ClassNotFoundException => false }
      }
    val unresolved = Graft.catalog.filterNot { op =>
      // entry points carry method suffixes and prose ("graft.etl.Lake.
      // build/write", "… (SQL + Column API)") — resolve the longest
      // dotted prefix that names a class
      val token = "graft\\.[A-Za-z0-9_.]+".r.findFirstIn(op.entryPoint).getOrElse("")
      val segs = token.split("\\.")
      (segs.length to 2 by -1).exists(n => resolves(segs.take(n).mkString(".")))
    }
    assert(unresolved.isEmpty,
      s"catalog entry points that resolve to nothing: ${unresolved.map(_.entryPoint)}")
  }

  test("the catalog covers every area and stays unique") {
    val dupes = Graft.catalog.groupBy(o => (o.area, o.task)).filter(_._2.length > 1)
    assert(dupes.isEmpty, s"duplicate catalog rows: ${dupes.keys}")
    assert(Graft.catalog.map(_.area).distinct.size >= 10)
    // the markdown emitter renders one row per op (plus 2 header lines)
    assert(Graft.markdownTable.linesIterator.size === Graft.catalog.size + 2)
  }
}
