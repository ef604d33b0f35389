"""Cross-implementation XML fixtures: byte-exact strings as the reference's
scala-xml literals serialize them (whitespace text nodes, indentation and
Java number formatting included), hand-transcribed from the toXML
definitions at FeatureCorrelation.scala:55-63 (Match), :94-99 (Punch),
:231-244 (Config), FeatureSegmentation.scala:48-52 (Break), :179-189
(Config), SelfSimilarity.scala:217-238, CrossSimilarity.scala:207-219,
impl/SpanUtil.scala:32-36.  One known byte-level delta: where an optional
element is absent, scala-xml leaves the literal's two adjacent ``"\\n  "``
text nodes — a blank line holding two trailing spaces — which these
fixtures write as a bare newline.  Our parsers must read these verbatim,
and our serializer's output must round-trip through a
whitespace-insensitive ``(xml \\ "tag").text``-style read like the Scala
readers use."""

import math
import xml.etree.ElementTree as ET

import pytest

from strugatzki_tpu.config import (Break, CorrelationConfig,
                                   CrossSimilarityConfig, Match, Punch,
                                   SegmentationConfig, SelfSimilarityConfig)
from strugatzki_tpu.span import Span

# --- <match> — 3-space child indent (FeatureCorrelation.scala:55-63) -------
MATCH_FIXTURE = """<match>
   <sim>0.81</sim>
   <file>/db/x.aif</file>
   <start>1234</start>
   <stop>5678</stop>
   <boostIn>1.5</boostIn>
   <boostOut>2.5</boostOut>
</match>"""

# --- <correlate> with punch-out: punchIn/punchOut embed Punch.toXML.child
# whose own literal newlines/indent come along (FeatureCorrelation.scala:
# 94-99, 231-244) ------------------------------------------------------------
CORRELATE_PUNCHOUT_FIXTURE = """<correlate>
  <database>/db</database>
  <input>/tmp/in_feat.xml</input>
  <punchIn>
  <start>100</start>
  <stop>200</stop>
  <weight>0.5</weight>
</punchIn>
  <punchOut>
  <start>300</start>
  <stop>400</stop>
  <weight>0.75</weight>
</punchOut>
  <minPunch>22050</minPunch>
  <maxPunch>88200</maxPunch>
  <normalize>true</normalize>
  <maxBoost>8.0</maxBoost>
  <numMatches>1</numMatches>
  <numPerFile>1</numPerFile>
  <minSpacing>0</minSpacing>
</correlate>"""

# without punch-out, the {punchOut match…} expression contributes nothing
# but the literal's surrounding whitespace text nodes remain
CORRELATE_NO_PUNCHOUT_FIXTURE = """<correlate>
  <database>/db</database>
  <input>/tmp/in_feat.xml</input>
  <punchIn>
  <start>100</start>
  <stop>200</stop>
  <weight>0.25</weight>
</punchIn>

  <minPunch>22050</minPunch>
  <maxPunch>88200</maxPunch>
  <normalize>false</normalize>
  <maxBoost>2.5</maxBoost>
  <numMatches>5</numMatches>
  <numPerFile>2</numPerFile>
  <minSpacing>44100</minSpacing>
</correlate>"""

# --- <break> (FeatureSegmentation.scala:48-52) ------------------------------
BREAK_FIXTURE = """<break>
  <sim>-0.25</sim>
  <pos>123456</pos>
</break>"""

# --- <segmentation> — 5-space child indent, 2-space closing-tag indent,
# inline SpanUtil.toXML children (FeatureSegmentation.scala:179-189) ---------
SEGMENTATION_FIXTURE = """<segmentation>
     <database>/db</database>
     <input>/tmp/in_feat.xml</input>
     <span><start>5120</start><stop>102400</stop></span>
     <corr>22050</corr>
     <weight>0.5</weight>
     <normalize>true</normalize>
     <numBreaks>3</numBreaks>
     <minSpacing>22050</minSpacing>
  </segmentation>"""

# Span.all serializes as the minimized empty element
SEGMENTATION_ALL_SPAN_FIXTURE = """<segmentation>
     <database>/db</database>
     <input>/tmp/in_feat.xml</input>
     <span/>
     <corr>44100</corr>
     <weight>0.75</weight>
     <normalize>false</normalize>
     <numBreaks>1</numBreaks>
     <minSpacing>22050</minSpacing>
  </segmentation>"""

# --- <selfsimilarity> — optional input2/span lines leave their literal
# whitespace behind when absent; spanToXML's own literal indents its
# children and puts ONE space before </span> (SelfSimilarity.scala:217-238)
SELFSIM_FIXTURE = """<selfsimilarity>
  <database>/db</database>
  <input>/tmp/in_feat.xml</input>
  <input2>/tmp/in2_feat.xml</input2>
  <output>/tmp/out.png</output>
  <span>
  <start>1000</start>
  <stop>90000</stop>
 </span>
  <corr>44100</corr>
  <decimation>2</decimation>
  <weight>0.5</weight>
  <colors>psycho</colors>
  <colorWarp>0.5</colorWarp>
  <colorCeil>0.9</colorCeil>
  <colorInv>true</colorInv>
  <normalize>true</normalize>
</selfsimilarity>"""

SELFSIM_MINIMAL_FIXTURE = """<selfsimilarity>
  <database>/db</database>
  <input>/tmp/in_feat.xml</input>

  <output>/tmp/out.png</output>

  <corr>44100</corr>
  <decimation>1</decimation>
  <weight>0.5</weight>
  <colors>gray</colors>
  <colorWarp>1.0</colorWarp>
  <colorCeil>1.0</colorCeil>
  <colorInv>false</colorInv>
  <normalize>true</normalize>
</selfsimilarity>"""

# --- <crosssimilarity> (CrossSimilarity.scala:207-219) ----------------------
CROSSSIM_FIXTURE = """<crosssimilarity>
  <database>/db</database>
  <input1>/tmp/a_feat.xml</input1>
  <input2>/tmp/b_feat.xml</input2>
  <output>/tmp/sim.aif</output>
  <outputType>aiff</outputType>
  <span1>
  <start>512</start>
  <stop>51200</stop>
 </span1>

  <weight>0.25</weight>
  <normalize>true</normalize>
  <maxBoost>8.0</maxBoost>
</crosssimilarity>"""


def test_match_fixture():
    m = Match.from_xml(ET.fromstring(MATCH_FIXTURE))
    assert m == Match(0.81, "/db/x.aif", Span(1234, 5678), 1.5, 2.5)
    # and our serialization reads back identically
    assert Match.from_xml(m.to_xml()) == m


def test_correlate_punchout_fixture():
    cfg = CorrelationConfig.from_xml(ET.fromstring(CORRELATE_PUNCHOUT_FIXTURE))
    assert cfg.database_folder == "/db"
    assert cfg.meta_input == "/tmp/in_feat.xml"
    assert cfg.punch_in == Punch(Span(100, 200), 0.5)
    assert cfg.punch_out == Punch(Span(300, 400), 0.75)
    assert cfg.min_punch == 22050 and cfg.max_punch == 88200
    assert cfg.normalize is True
    assert cfg.max_boost == pytest.approx(8.0)
    assert (cfg.num_matches, cfg.num_per_file, cfg.min_spacing) == (1, 1, 0)
    assert CorrelationConfig.from_xml(cfg.to_xml()) == cfg


def test_correlate_no_punchout_fixture():
    cfg = CorrelationConfig.from_xml(
        ET.fromstring(CORRELATE_NO_PUNCHOUT_FIXTURE))
    assert cfg.punch_in == Punch(Span(100, 200), 0.25)
    assert cfg.punch_out is None
    assert cfg.normalize is False
    assert cfg.max_boost == pytest.approx(2.5)
    assert (cfg.num_matches, cfg.num_per_file, cfg.min_spacing) == (5, 2, 44100)
    assert CorrelationConfig.from_xml(cfg.to_xml()) == cfg


def test_break_fixture():
    b = Break.from_xml(ET.fromstring(BREAK_FIXTURE))
    assert b == Break(-0.25, 123456)
    assert Break.from_xml(b.to_xml()) == b


def test_segmentation_fixture():
    cfg = SegmentationConfig.from_xml(ET.fromstring(SEGMENTATION_FIXTURE))
    assert cfg.database_folder == "/db"
    assert cfg.span == Span(5120, 102400)
    assert cfg.corr_len == 22050
    assert cfg.temporal_weight == pytest.approx(0.5)
    assert cfg.normalize is True
    assert (cfg.num_breaks, cfg.min_spacing) == (3, 22050)
    assert SegmentationConfig.from_xml(cfg.to_xml()) == cfg


def test_segmentation_all_span_fixture():
    cfg = SegmentationConfig.from_xml(
        ET.fromstring(SEGMENTATION_ALL_SPAN_FIXTURE))
    assert cfg.span == Span.all()
    assert cfg.corr_len == 44100
    assert cfg.num_breaks == 1
    assert SegmentationConfig.from_xml(cfg.to_xml()) == cfg


def test_selfsimilarity_fixture():
    cfg = SelfSimilarityConfig.from_xml(ET.fromstring(SELFSIM_FIXTURE))
    assert cfg.meta_input == "/tmp/in_feat.xml"
    assert cfg.meta_input2 == "/tmp/in2_feat.xml"
    assert cfg.image_output == "/tmp/out.png"
    assert cfg.span == Span(1000, 90000)
    assert cfg.corr_len == 44100 and cfg.decimation == 2
    assert cfg.colors == "psycho"
    assert cfg.color_warp == pytest.approx(0.5)
    assert cfg.color_ceil == pytest.approx(0.9)
    assert cfg.color_inv is True
    assert SelfSimilarityConfig.from_xml(cfg.to_xml()) == cfg


def test_selfsimilarity_minimal_fixture():
    cfg = SelfSimilarityConfig.from_xml(ET.fromstring(SELFSIM_MINIMAL_FIXTURE))
    assert cfg.meta_input2 is None
    assert cfg.span == Span.all()
    assert cfg.colors == "gray"
    assert cfg.color_inv is False
    assert SelfSimilarityConfig.from_xml(cfg.to_xml()) == cfg


def test_crosssimilarity_fixture():
    cfg = CrossSimilarityConfig.from_xml(ET.fromstring(CROSSSIM_FIXTURE))
    assert cfg.meta_input1 == "/tmp/a_feat.xml"
    assert cfg.meta_input2 == "/tmp/b_feat.xml"
    assert cfg.audio_output == "/tmp/sim.aif"
    assert cfg.audio_output_type.id == "aiff"
    assert cfg.span1 == Span(512, 51200)
    assert cfg.span2 == Span.all()
    assert cfg.temporal_weight == pytest.approx(0.25)
    assert cfg.max_boost == pytest.approx(8.0)
    assert CrossSimilarityConfig.from_xml(cfg.to_xml()) == cfg


def test_our_output_survives_scala_style_read():
    """The Scala readers select by tag and parse `.text` — emulate that
    whitespace-insensitive read over OUR serializer output for every
    config, ensuring no extra/renamed elements and Java-parseable values."""
    def scala_text(root, tag):
        els = root.findall(tag)
        assert len(els) <= 1, (tag, "duplicate elements")
        return els[0].text if els else None

    cfg = CorrelationConfig(
        punch_in=Punch(Span(7, 9), 0.125), punch_out=Punch(Span(11, 13), 1.0),
        min_punch=1, max_punch=2, normalize=True, max_boost=3.5,
        num_matches=4, num_per_file=2, min_spacing=6).build()
    x = cfg.to_xml()
    assert x.tag == "correlate"
    assert float(scala_text(x, "maxBoost")) == 3.5
    assert scala_text(x, "normalize") in ("true", "false")
    assert int(scala_text(x, "minPunch")) == 1
    pi = x.find("punchIn")
    assert int(pi.find("start").text) == 7
    assert float(pi.find("weight").text) == 0.125
    po = x.find("punchOut")
    assert int(po.find("stop").text) == 13
