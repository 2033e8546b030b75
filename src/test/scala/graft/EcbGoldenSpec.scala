package graft

import graft.sources.Sources

/** Golden-equivalence against the REFERENCE ECB+ parser: expected
  * mentions produced by executing preprocess_ecbplus.process_xml (pure
  * stdlib) on a 6-token, 6-markable, 2-relation document. Pins the
  * ACT/NEG/empty-markable filters, 1-based token spans, relation-id
  * entity labels, and the gold-sentence restriction.
  */
class EcbGoldenSpec extends SparkSpec {

  private val xml =
    """<Document doc_name="3_2ecb.xml">
      |<token t_id="1" sentence="0" number="0">Officials</token>
      |<token t_id="2" sentence="0" number="1">said</token>
      |<token t_id="3" sentence="0" number="2">the</token>
      |<token t_id="4" sentence="0" number="3">fire</token>
      |<token t_id="5" sentence="1" number="0">It</token>
      |<token t_id="6" sentence="1" number="1">burned</token>
      |<Markables>
      |<HUMAN_PART_ORG m_id="1"><token_anchor t_id="1"/></HUMAN_PART_ORG>
      |<NON_HUMAN_PART m_id="2"><token_anchor t_id="3"/><token_anchor t_id="4"/></NON_HUMAN_PART>
      |<ACTION_OCCURRENCE m_id="3"><token_anchor t_id="2"/></ACTION_OCCURRENCE>
      |<NEG_ACTION m_id="4"><token_anchor t_id="6"/></NEG_ACTION>
      |<HUMAN_PART m_id="5"><token_anchor t_id="5"/></HUMAN_PART>
      |<EMPTY_ONE m_id="6"></EMPTY_ONE>
      |</Markables>
      |<Relations>
      |<CROSS_DOC_COREF r_id="r9"><source m_id="2"/><source m_id="5"/><source m_id="6"/></CROSS_DOC_COREF>
      |<CROSS_DOC_COREF r_id="r10"><source m_id="1"/><source m_id="3"/></CROSS_DOC_COREF>
      |</Relations>
      |</Document>""".stripMargin

  test("ECB+ parse matches the reference on all sentences") {
    val out = Sources.parseEcbPlusXml(xml, Some(Set("0", "1")))
      .map(m => (m.leftContext, m.mention, m.rightContext, m.entityId)).toSet
    out shouldBe Set(
      ("Officials said", "the fire", "It burned", "r9"),
      ("Officials said the fire", "It", "burned", "r9"),
      ("", "Officials", "said the fire It burned", "r10"))
  }

  test("ECB+ parse matches the reference under the gold-sentence filter") {
    val out = Sources.parseEcbPlusXml(xml, Some(Set("0")))
      .map(m => (m.leftContext, m.mention, m.rightContext, m.entityId)).toSet
    out shouldBe Set(
      ("Officials said", "the fire", "It burned", "r9"),
      ("", "Officials", "said the fire It burned", "r10"))
  }
}
