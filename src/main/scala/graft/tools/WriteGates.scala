package graft.tools

/** Regenerate the committed gates.json from SparkEntry.gates (dev tool;
  * GatesSpec fails when the committed copy drifts from the registry). */
object WriteGates {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("gates.json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path), graft.SparkEntry.gatesJson + "\n")
    println(s"[writegates] wrote $path")
  }
}
