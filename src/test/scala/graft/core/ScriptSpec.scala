package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ScriptSpec extends AnyFunSuite {

  test("per-script letter counts; digits are Common, not Latin") {
    val p = Script.profile("abc 42")
    assert(p.latin == 3 && p.digits == 2 && p.cyrillic == 0)
    assert(p.dominant == "latin")
  }

  test("multi-script text counts every class") {
    val p = Script.profile(
      "ab мир Ελ 漢字 " +
        "مرحبا 한 ひカ")
    assert(p.latin == 2 && p.cyrillic == 3 && p.greek == 2 && p.han == 2)
    assert(p.arabic == 5 && p.hangul == 1 && p.kana == 2)
    assert(p.dominant == "arabic")
  }

  test("dominant: first in fixed order wins ties; none when unscripted") {
    assert(Script.profile("ab ми").dominant == "latin",
      "latin ties cyrillic at 2 - order breaks the tie")
    assert(Script.profile("1234 !?").dominant == "none")
    assert(Script.profile("").dominant == "none")
    assert(Script.profile(null).dominant == "none")
  }

  test("confusable words: Latin+Cyrillic in one whitespace token") {
    // p + CYRILLIC SMALL A + ypal — the homoglyph spam shape
    val p = Script.profile("pаypal is fine мир bаnk")
    assert(p.confusableWords == 2)
    // pure-script words never flag, even side by side
    assert(Script.profile("paypal мир").confusableWords == 0)
    // token at end of string flushes
    assert(Script.profile("xб").confusableWords == 1)
  }

  test("supplementary code points advance correctly") {
    // U+20BB7 is a Han ideograph outside the BMP (surrogate pair)
    val p = Script.profile(new String(Character.toChars(0x20bb7)) + " ok")
    assert(p.han == 1 && p.latin == 2)
  }
}
