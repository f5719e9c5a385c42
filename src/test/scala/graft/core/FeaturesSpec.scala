package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Scalar feature goldens mirroring the reference unit tests
  * (tests/trainer/test_information_extraction.py feature scalars).
  */
class FeaturesSpec extends AnyFunSuite {

  test("digit/space/special/vowel/upper counts") {
    assert(Features.digitCount("ab12c3") == 3)
    assert(Features.spaceCount("a b\tc") == 2 + 3) // tab counts 1 + 3 extra
    assert(Features.specialCount("a,b.c!") == 3)
    assert(Features.vowelCount("Hello You") == 4)
    assert(Features.upperCount("AbCdE") == 3)
  }

  test("unique and duplicate char counts") {
    assert(Features.uniqueCharCount("aabbc") == 3)
    assert(Features.duplicateCount("aabbc") == 4)
    assert(Features.duplicateCount("abc") == 0)
  }

  test("strip accents") {
    assert(Features.stripAccents("über Café") == "uber Cafe")
    assert(Features.accentedCharCount("über Café") == 2)
    assert(Features.accentedCharCount("plain") == 0)
  }

  test("substring count is lowercased and non-overlapping") {
    assert(Features.substringCount("Schloss Schule", "sch") == 2)
    assert(Features.substringCount("aaaa", "aa") == 2)
  }

  test("num_count via engine normalization") {
    assert(Features.numCount("1.234,56") == 1234.56)
    assert(Features.numCount("abc") == 0.0)
  }

  test("date_count days since 2010-01-01") {
    assert(Features.dateCount("02.01.2010") == 31) // month-first like pandas
    assert(Features.dateCount("01.01.2010") == 1) // diff 0 → 1 (reference quirk)
    assert(Features.dateCount("01.01.2011") == 365)
    assert(Features.dateCount("31.12.2009") == -1)
    assert(Features.dateCount("hello") == 0)
  }

  test("year/month/day extraction") {
    assert(Features.yearMonthDay("01.02.2019") == (2019, 2, 1))
    assert(Features.yearMonthDay("nope") == (0, 0, 0))
  }

  test("feature vector shape and order") {
    assert(Features.width == Features.featureNames.length)
    assert(Features.featureNames(42) == "feat_substring_count_h") // reference regression
    val v = Features.convertToFeat("12,34 %")
    assert(v.length == Features.width)
    assert(v(Features.featureNames.indexOf("feat_len")) == 7.0)
    assert(v(Features.featureNames.indexOf("feat_substring_count_percent")) == 1.0)
    assert(v(Features.featureNames.indexOf("feat_substring_count_comma")) == 1.0)
  }
}
