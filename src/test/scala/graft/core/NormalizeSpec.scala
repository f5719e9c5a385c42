package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden tables mirrored from the reference normalization tests
  * (/root/reference/tests/test_normalize.py).
  */
class NormalizeSpec extends AnyFunSuite {

  private def d(x: Double): Option[Double] = Some(x)

  val percentages: Seq[(String, Option[Double])] = Seq(
    "12,34" -> d(0.1234), "12,3" -> d(0.123), "123,45" -> d(1.2345), "59,00-" -> d(0.59),
    "12,34 %" -> d(0.1234), "12,34 %." -> d(0.1234), "12,34 % ." -> d(0.1234),
    "12,34 %;" -> d(0.1234), "12,34 % ;" -> d(0.1234), "12,34 %," -> d(0.1234),
    "12,34 % ," -> d(0.1234), "12,34  %  ." -> d(0.1234), "12.34 %" -> d(0.1234),
    "12.³4 %" -> None, "12.34 %." -> d(0.1234), "12.34 % ." -> d(0.1234),
    "12.34  %  ." -> d(0.1234), "434,27%," -> d(4.3427), "100 %" -> d(1.0), "0 %" -> d(0.0),
    "0.00" -> d(0.0), "0.0" -> d(0.0), "0" -> d(0.0), "0,00" -> d(0.0), "0,0³" -> None,
    "0,0" -> d(0.0),
  )

  test("percentage golden table") {
    percentages.foreach { case (in, want) =>
      assert(Normalize.normalizeToPercentage(in) == want, s"input >>$in<<")
    }
  }

  val positives: Seq[(String, Option[Double])] = Seq(
    "59,00-" -> d(59), "585,87/-" -> d(585.87), "'786,71-" -> d(786.71),
    "7,375,009+ " -> d(7375009), ":2.000, 08 " -> d(2000.08), "-2.759,7°" -> d(2759.7),
    "‚22,95" -> d(22.95), "1.967." -> d(1967.00), "-1.800.00" -> d(1800), "“71,90" -> d(71.90),
    "-2.905.00" -> d(2905), "-O,51" -> d(0.51), "-3,000,00" -> d(3000), "+159,;03" -> d(159.03),
    "5,000,00" -> d(5000), "42, 975,38" -> d(42975.38), "4.187.184.13" -> d(4187184.13),
    "549.886.799.221" -> d(549886799221.0), "4.2." -> None, "ein" -> d(1), "Drei" -> d(3),
    "vier" -> d(4), "One" -> d(1), "TWo" -> d(2), "eleven" -> d(11), "–100" -> d(100),
    "NIL" -> d(0), "StringThatIncludesNIL" -> None, "kein" -> d(0), "KEin" -> d(0),
    "StringThatIncludeskein" -> None, "keinen" -> d(0), "KEinen" -> d(0),
    "StringThatIncludeskeinen" -> None, "keiner" -> d(0), "KEiner" -> d(0),
    "StringThatIncludeskeiner" -> None, "none" -> d(0), "NoNe" -> d(0),
    "StringThatIncludesnone" -> None, "54³" -> None,
  )

  test("positive-number golden table") {
    positives.foreach { case (in, want) =>
      assert(Normalize.normalizeToPositiveFloat(in) == want, s"input >>$in<<")
    }
  }

  val numbers: Seq[(String, Option[Double])] = Seq(
    "3,444, 40+" -> d(3444.4), "5.473,04S" -> d(-5473.04), " 362,85H" -> d(362.85),
    "3,288,50" -> d(3288.50), "1,635,74" -> d(1635.74), "0,00" -> d(0), "331.500" -> d(331500),
    "4.361.163" -> d(4361163), "4.361.163-" -> d(-4361163),
    "111144443333////111100008888////44440000000022226666" -> None,
    "(118.704)" -> d(-118704), "10.225.717" -> d(10225717), "29.485.259" -> d(29485259),
    "129.485.259" -> d(129485259), "3³1.500" -> None, "3.000.000" -> d(3000000),
    "56,430,681" -> d(56430681), "43.34.34" -> None, "(51.901,99)" -> d(-51901.99),
    "2.662| " -> d(2662), "-,-" -> d(0), "-" -> d(0), "-,--" -> d(0), "--,--" -> d(0),
    "€1.010.296" -> d(1010296), "€3.372.097" -> d(3372097), "€(1.099)" -> d(-1099),
    "€54.314" -> d(54314), "–100" -> d(-100), "3.456,814,75" -> d(3456814.75),
    "NIL" -> d(0), "abcdef" -> None, "I" -> d(1), "III" -> d(3), " XIV  " -> d(14),
    "12³" -> None, " XL IV  " -> d(44), "42.34-" -> d(-42.34), "-2" -> d(-2), "" -> None,
  )

  test("number golden table") {
    numbers.foreach { case (in, want) =>
      assert(Normalize.normalizeToFloat(in) == want, s"input >>$in<<")
    }
  }

  val dates: Seq[(String, Option[String])] = Seq(
    "1. November 2019" -> Some("2019-11-01"), "1.Oktober2019 " -> Some("2019-10-01"),
    "1. September 2019" -> Some("2019-09-01"), "1.August2019" -> Some("2019-08-01"),
    "23.0919" -> Some("2019-09-23"), "011019" -> Some("2019-10-01"),
    "0210.19" -> Some("2019-10-02"), "1. Mai 2019" -> Some("2019-05-01"),
    "16.122019" -> Some("2019-12-16"), "07092012" -> Some("2012-09-07"),
    "14132020" -> None, "250785" -> Some("1985-07-25"), "1704.2020" -> Some("2020-04-17"),
    "/04.12." -> Some("0000-12-04"), "04.12./" -> Some("0000-12-04"),
    "02.06./02.06." -> Some("0000-06-02"), "02.06./ 02.06." -> Some("0000-06-02"),
    "02-05-2019" -> Some("2019-05-02"), "1. Oktober2019" -> Some("2019-10-01"),
    "13 Mar 2020" -> Some("2020-03-13"), "30, Juni" -> Some("0000-06-30"),
    "2019-06-01" -> Some("2019-06-01"), "30 Sep 2019" -> Some("2019-09-30"),
    "July 1, 2019" -> Some("2019-07-01"), "(29.03.2018)" -> Some("2018-03-29"),
    "03,12." -> Some("0000-12-03"), "23,01." -> Some("0000-01-23"),
    "05.09;" -> Some("0000-09-05"), "24,01." -> Some("0000-01-24"),
    "15.02.‚2019" -> Some("2019-02-15"), "1993-02-05T00:00:00" -> Some("1993-02-05"),
    "July 31 ,2019" -> Some("2019-07-31"), "23.0K.2010" -> None, "24.13.2020" -> None,
    "24.13.202³" -> None, "03,07," -> None, "30.07.2.90" -> None,
    "09/2002" -> Some("2002-09-01"), "09.2002" -> Some("2002-09-01"),
    "09/18" -> Some("2018-09-01"), "Oktober 2011" -> Some("2011-10-01"),
    "2001" -> Some("2001-01-01"),
    "1.01.01" -> Some("2001-01-01"), "4.01.89" -> Some("1989-01-04"),
    "2/03/05" -> Some("2005-03-02"), "4/11/99" -> Some("1999-11-04"),
    "01.A1.2001" -> None, "23.45.2020dasd" -> None, "20,20,3030" -> None,
    "20.90/9012" -> None, "" -> None, "-2" -> None,
  )

  test("date golden table") {
    dates.foreach { case (in, want) =>
      assert(Normalize.normalizeToDate(in) == want, s"input >>$in<<")
    }
  }

  val bools: Seq[(String, Option[Boolean])] = Seq(
    "nicht vorhanden" -> Some(false), "nein" -> Some(false), "nicht unterkellert" -> Some(false),
    "ohne Rabattschutz" -> Some(false), "mit Schutzbrief" -> Some(true),
    "nicht versichert" -> Some(false), "ja" -> Some(true), "mit" -> Some(true),
    "ohne" -> Some(false), "" -> None, "alleinstehend ohne Kind" -> None,
  )

  test("bool golden table") {
    bools.foreach { case (in, want) =>
      assert(Normalize.normalizeToBool(in) == want, s"input >>$in<<")
    }
  }

  test("totality: malformed web tokens yield None, never throw") {
    val nasty = Seq("1,234.56.78", "1,2.3.4", "12.3.4;", "€1,2.3.4", "159,;0.3.4")
    nasty.foreach { s =>
      assert(Normalize.normalizeToFloat(s).isEmpty, s"float >>$s<<")
      assert(Normalize.normalizeToPositiveFloat(s).isEmpty, s"pos >>$s<<")
      Normalize.normalizeToPercentage(s) // must not throw
      Normalize.normalizeToDate(s) // must not throw
    }
  }

  test("dispatch by data type") {
    assert(Normalize.normalize("Woch.Arb.Zt", "float").isEmpty)
    assert(Normalize.normalize("12,34", "percentage") == Some(0.1234))
    assert(Normalize.normalize("text", "str") == Some("text"))
    assert(Normalize.normalize("x", "unknown").isEmpty)
  }

  test("pathological tokens normalize to None, never throw (normalize.py:645-667)") {
    // "......." matches the 1.234.56 branch shape but flattens to ""
    assert(Normalize.normalizeToFloat(".......").isEmpty)
    assert(Normalize.normalizeToAbsoluteFloat("........").isEmpty)
    for (bad <- Seq(".......", "..", ",,,,,,,", ". . . .", "\u0000\u0000"))
      assert(Normalize.normalize(bad, "float").isEmpty, s"'$bad' must be None")
  }
}
