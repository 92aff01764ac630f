package graft

/** Registry name dump for shell probes: one line per registered query,
  * `<name> headline|verifyOnly` — the input list for the registry-wide
  * scale ledger (scripts/ledger.sh) and any name-driven sweep. No Spark
  * session: the registry is a static structure. */
object ProbeNames {
  def main(args: Array[String]): Unit =
    graft.queries.Registry.all.foreach(q =>
      println(s"${q.name} ${if (q.verifyOnly) "verifyOnly" else "headline"}"))
}
