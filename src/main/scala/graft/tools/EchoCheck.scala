package graft.tools

/** Throwaway harness check: verifies the forked `runMain` stdout reaches the
  * caller with no sbt decoration and nothing after the final line. The driver
  * parses the LAST stdout line of the bench run as JSON; this main lets us
  * assert that contract cheaply (no Spark session).
  */
object EchoCheck {
  def main(args: Array[String]): Unit = {
    println("""{"before":"payload"}""")
    println("""{"metric":"total","value":1.0,"unit":"sec","queries":{"q1":0.5},"sf":"echo"}""")
    System.out.flush()
  }
}
