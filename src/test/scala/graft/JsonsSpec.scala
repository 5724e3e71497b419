package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared JSON string escaper (ADVICE r15): Bench's worker
  * cmdlines and Verify's manifests both pass through [[Jsons.str]], so
  * a control char in a captured `python -c` commandLine (or an
  * exception message) must never reach an artifact unescaped — one
  * literal control char makes the whole BENCH_r*.json / _failures.json
  * line unparseable downstream and silently zeroes the round's
  * evidence.
  */
class JsonsSpec extends AnyFunSuite {
  test("plain strings pass through quoted") {
    assert(Jsons.str("abc") == "\"abc\"")
    assert(Jsons.str("") == "\"\"")
  }

  test("quote and backslash are escaped") {
    assert(Jsons.str("""a"b\c""") == """"a\"b\\c"""")
  }

  test("named control chars use their short escapes") {
    assert(Jsons.str("a\nb\rc\td") == """"a\nb\rc\td"""")
  }

  test("remaining control chars (<0x20) become \\uXXXX") {
    assert(Jsons.str("a\u0000b\u001fc") == "\"a\\u0000b\\u001fc\"")
  }

  test("every escaped control char round-trips through a JSON parser") {
    // The exact failure class from ADVICE r15: a newline inside a
    // captured `python -c` argument. Parse with Spark's bundled
    // Jackson — the same family of parser the driver's json.load
    // represents — and require the original string back.
    val hostile = "python3 -c 'import os\nos.system(\"x\")'\tend\\"
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = mapper.readValue(Jsons.str(hostile), classOf[String])
    assert(parsed == hostile)
  }
}
