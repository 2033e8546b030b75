package graft

import graft.sources.Sources

/** Golden-equivalence against the REFERENCE parsers: expected outputs
  * produced by executing medmentions.parse_pubtator and
  * preprocess_aida_yago2.parse (both pure stdlib) on random documents.
  * Pins title/abstract splitting, mention offsets, type splitting, BIO
  * spans - and the reference's glued-last-two-tokens text quirk.
  */
class ParserGoldenSpec extends SparkSpec {

  private val pubFixture = "100|t|q7 longword longword\n100|a|delta x beta delta x longword\n100\t28\t31\t be\tC0\tT1\n\n101|t|longword x alpha q7\n101|a|x x beta alpha delta alpha\n101\t15\t16\ta\tC0\tT2,T3\n\n102|t|longword delta x delta\n102|a|delta beta q7\n102\t16\t19\t de\tC0\tT3"
  private val pubGolden: Seq[(String, String, String, Seq[(Int, Int, String, Seq[String], String)])] = Seq(
    ("100", "q7 longword longword", "delta x beta delta x longword", Seq(((28, 31, " be", Seq("C0"), "T1")))),
    ("101", "longword x alpha q7", "x x beta alpha delta alpha", Seq(((15, 16, "a", Seq("C0"), "T2,T3")))),
    ("102", "longword delta x delta", "delta beta q7", Seq(((16, 19, " de", Seq("C0"), "T3")))))

  private val aidaFixture = "-DOCSTART- (1 EU)\nalpha\tB\talpha\tE0_0\ndelta\tB\tdelta\tE0_1\nalpha\tI\t-\tE0_1\nalpha\nalpha\tB\talpha\tE0_4\nalpha\n-DOCSTART- (2 Test)\ndelta\tB\tdelta\tE1_0\nq7\ngamma\tB\tgamma\tE1_2\ndelta\tI\t-\tE1_2\nq7\nbeta\tB\tbeta\tE1_5\nalpha\tI\t-\tE1_5\n"
  private val aidaGolden: Seq[(String, String, Seq[(String, Int, Int)])] = Seq(
    ("1 EU", "alpha delta alpha alpha alphaalpha", Seq((("E0_0", 0, 5)), (("E0_1", 6, 17)), (("E0_4", 24, 29)))),
    ("2 Test", "delta q7 gamma delta q7 betaalpha", Seq((("E1_0", 0, 5)), (("E1_2", 9, 20)), (("E1_5", 24, 33)))))

  test("PubTator parser matches the reference parse exactly") {
    val docs = Sources.pubTatorFromString(spark, pubFixture).collect().sortBy(_.pmid)
    docs.length shouldBe pubGolden.length
    docs.zip(pubGolden.sortBy(_._1)).foreach { case (d, (pmid, title, abst, ms)) =>
      d.pmid shouldBe pmid
      d.title shouldBe title
      d.abstract_ shouldBe abst
      d.mentions.map(m => (m.start, m.end, m.text, m.semanticTypes, m.entityId)) shouldBe ms
    }
  }

  // Blank lines between sentences: the reference processes them as
  // empty tokens, so a sentence break becomes a DOUBLE space and a
  // trailing blank line suppresses the last-two-tokens glue. Golden
  // computed by executing preprocess_aida_yago2.parse on this fixture.
  private val aidaBlankFixture = "-DOCSTART- (1 EU)\nalpha\tB\talpha\tE0_0\ndelta\tB\tdelta\tE0_1\nalpha\tI\t-\tE0_1\n\nalpha\nbeta\tB\tbeta\tE0_5\n\n-DOCSTART- (2 Test)\ndelta\tB\tdelta\tE1_0\nq7\n\ngamma\tB\tgamma\tE1_3\ndelta\tI\t-\tE1_3\n"
  private val aidaBlankGolden: Seq[(String, String, Seq[(String, Int, Int)])] = Seq(
    ("1 EU", "alpha delta alpha  alpha beta", Seq((("E0_0", 0, 5)), (("E0_1", 6, 17)), (("E0_5", 25, 29)))),
    ("2 Test", "delta q7  gammadelta", Seq((("E1_0", 0, 5)), (("E1_3", 10, 20)))))

  test("AIDA parser matches the reference on blank-line documents") {
    val docs = Sources.aidaFromString(spark, aidaBlankFixture).collect().sortBy(_.docId)
    docs.length shouldBe aidaBlankGolden.length
    docs.zip(aidaBlankGolden.sortBy(_._1)).foreach { case (d, (docid, text, ms)) =>
      d.docId shouldBe docid
      d.text shouldBe text
      d.mentions.map(m => (m.entityId, m.start, m.end)) shouldBe ms
    }
  }

  test("AIDA parser matches the reference parse exactly (incl. glue quirk)") {
    val docs = Sources.aidaFromString(spark, aidaFixture).collect().sortBy(_.docId)
    docs.length shouldBe aidaGolden.length
    docs.zip(aidaGolden.sortBy(_._1)).foreach { case (d, (docid, text, ms)) =>
      d.docId shouldBe docid
      d.text shouldBe text
      d.mentions.map(m => (m.entityId, m.start, m.end)) shouldBe ms
    }
  }
}
