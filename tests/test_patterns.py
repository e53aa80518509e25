"""Declarative pattern tier vs hand-computed expectations (reference
parity: parsers/ast_grep_tier.py + ast_grep_patterns/ruby.yaml format)."""

from __future__ import annotations

import re

from code_graph_rag_spark.extract.patterns import (
    SCALA_CONFIG,
    compile_config,
    compile_pattern,
    pattern_edges,
    pattern_mentions,
)

DOC = """\
package demo
import scala.collection.mutable
case class Point(x: Int, y: Int)
object Geometry {
  def area(p: Point): Int = p.x * p.y
  val cached = area _
}
trait Shape
"""


def test_compile_pattern_shapes():
    rx = compile_pattern("def self.$NAME")
    assert re.match(rx, "  def self.build") is not None
    assert re.match(rx, "def selfXbuild") is None  # '.' stays literal
    rx2 = compile_pattern("case class $NAME")
    assert re.match(rx2, "case class Point(x: Int)").group(1) == "Point"
    assert re.match(rx2, "class Point") is None


def test_first_match_wins_order(spark):
    # "case class X" must claim before the general "class X" pattern
    docs = spark.createDataFrame(
        [("a.scala", "case class Point(x: Int)")], ["doc_id", "text"]
    )
    rows = pattern_mentions(docs, SCALA_CONFIG).collect()
    assert len(rows) == 1
    assert (rows[0]["kind"], rows[0]["name"]) == ("class", "Point")


def test_pattern_mentions_and_edges(spark):
    docs = spark.createDataFrame([("geo.scala", DOC)], ["doc_id", "text"])
    got = {
        (r["line_no"], r["kind"], r["name"])
        for r in pattern_mentions(docs, SCALA_CONFIG).collect()
    }
    assert got == {
        (2, "import", "scala.collection.mutable"),
        (3, "class", "Point"),
        (4, "class", "Geometry"),
        (5, "function", "area"),
        (8, "class", "Shape"),
    }
    edges = {
        (r["subj"], r["pred"], r["obj"], r["obj_label"])
        for r in pattern_edges(docs, SCALA_CONFIG).collect()
    }
    assert edges == {
        ("geo.scala", "DEFINES", "geo.scala.Point", "Class"),
        ("geo.scala", "DEFINES", "geo.scala.Geometry", "Class"),
        ("geo.scala", "DEFINES", "geo.scala.Shape", "Class"),
        ("geo.scala", "DEFINES", "geo.scala.area", "Function"),
        ("geo.scala", "IMPORTS", "scala.collection.mutable", "ExternalModule"),
    }


def test_config_order_is_priority():
    rules = compile_config(SCALA_CONFIG)
    kinds = [k for k, _ in rules]
    assert kinds == ["function", "class", "class", "class", "class", "import"]
