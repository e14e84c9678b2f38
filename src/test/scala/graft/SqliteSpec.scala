package graft

import graft.core.{ExtractionResult, ProcessingError}
import graft.extract.{RawDoc, Sqlite, SqliteExtractor}
import org.scalatest.funsuite.AnyFunSuite

class SqliteSpec extends AnyFunSuite {

  /** Real CPython-sqlite3-produced database (gzip+base64): table `people`
    * (4 rows incl. one 9KB bio that spills to overflow pages) and `notes`
    * (400 rows forcing interior b-tree pages). */
  private val realDbGz = "H4sIAJjSgWoC/+3ce2yddR3H8XOe+/Oc5znPOd2g7H7GLmzs2tOta8du7ehGt25ja3dh97brLuxy" +
    "tra7lDGwp0iUAFEiI0IUkQgKBrlFiaCichEVASMIBIlMJXEIRLkJRvB0O7/P96P/6B/GxOX3Tda0" +
    "r6TL991kOc/v164tK5t39XTmthe69rb15KoTmUQymViQyyUSCaP0x0vIDHxs0cfJxL8fIzG1IxkN" +
    "vBPvTcS3l97o0aNHjx49evTo0aNHjx49Z/rMMJzKyspkU09b+57OfYWezu5Tb+yFqxrrWxtzrfUN" +
    "zY25U5Sb0F7Y1ptrbVzXOnFD0q0cMiTZlz31afs7C/vVW+OfPvG05Sbsa9vbeeozJ+fadnTmmpa3" +
    "Ni5uXDU5191R6OrMlT6jeXKufVfh9F9+6mweHk/EJ0pv9OjRo0ePHj169OjRo+d/Pk/MNdxBSbfv" +
    "2raGQvuHC4zT2nxEjx49//mU/tGYw5N2ZdIdVb9nV0fnyPl/Pf1PqXtnoatn4Bag9L6lv0569OjR" +
    "o0ePHj169OjRo0fPGX9DkNBfBT169OjRo0ePHj169OjRo+eMnlX2wM//x+8OXAN48Uen39GjR48e" +
    "PXr06NGjR48ePXr0nBHjFgd+E5/TN2fg//8/kuxLxG/Fr8Q/jR+K74i/EBfj/fHmuDmui8fHg+JE" +
    "+s30y+kn0w+mb0tfnz6a3plenW5IT0sPT/vR+9Hvomej70V3RTdFV0UHos3R0qg2GhdVhJ+Efwpf" +
    "Cp8IHwi/El4XXhbuCFvD+nBqOCz0Uu+lTqSeST2S+kbqeKo/tT+1KbUkNSs1NpUNPg7eCF4MHg/u" +
    "D24Nrg16g+1BS7AgmBIMDVz/Xf81/xf+w/7X/Rv9ol/wN/pNfo0/xs94f/dOer/2HvPu877sXeMd" +
    "8tq95d5sb7xX4X7snnRfcH/k3uPe7F7tdrmb3SVujXuum3Y+cl53ful837nLOe4Unb3OOmehM9UZ" +
    "4lj22/bL9uP2vfYt9tX2AXujvdjO2yNsz3rHetV6ynrQutW6xjpobbWWWjXWaCs0PzBPmE+bD5m3" +
    "m9ebveY2c4U52xxnZoy/Ga8bzxmPGHcaNxjHjJ1GizHPmGgMTn6SPJl8Pvlo8u7k8dIXvqJvjjFl" +
    "4Hc+5KpqZ+U6Cvt6Ovf1VPRdAKwRnA2cKVgHnCFYC6wWnAXMC9YAqwRnAqcLzlA4q06wGlgrmAdS" +
    "URWQiqYDqWgakIqmAqloCpCKJgOpaBKQis5XWENFE4FUNAFIRecBqWg8kIrGAaloLJCKxgCp6Fwg" +
    "FY0GUlFO4UwqGgWkopFAKhoBpKLhQCoaBqSioUAqGgKkonOAVFQJpKKzFc6gorOAVDQYSEWDgFRU" +
    "AaSiLJCKMkAqioFUlAZSUQSkolBhNRWlgFQUAKnIB1KRB6QiF0hFDpCKbCAVWUAqMoFUZCjMU1ES" +
    "SEUJoBRdCZOgK2DScwwmOZfDpOYoTGIug0lLL0xSjiirkpLDMAk5BJOOgzDp6IFJRzdMOrpg0nEA" +
    "Jh37YdJRgEnHPmXTpWMvTDr2wKRjN0w6LoVJxy6YdOyESccOmHRsh0lHJwwd2W3GpFNWh4xshyJU" +
    "ZNsVISLbpggN2a2KkJDdoggF2c2KEJDdpAj7ZzcqwvrZDYpk+/VlqpXtL1Ek269TJNuvVSTbr1Ek" +
    "269WJNu3KpLtWxTJ9qsUyfYrFcn2F5dJXu6zKxTJ9ssVyfbLFMn2zYpk+6WKZPslimT7JkWy/UWK" +
    "ZPvFimT7RWWSl/ZsoyLZ/kJFsv1CRbJ9gyLZvl6RbL9AkWw/X5FsP0+RbD9XkWw/p0zyMp69QJFs" +
    "P1uRbF+nSLavVSTbz1Ik29coku1nKpLtZyiS7asVyfb5MslLdrZKkWw/XZFsP02RbD9VkWw/RZFs" +
    "P1mRbD9JkWx/viLZfqIi2X5CmeTlOXueItl+vCLZfpwi2X6sItl+jCLZ/lxFsv1oRbJ9TpFsP0qR" +
    "bD+yTPJSnB2hSLYfrki2H6ZIth+qSLYfoki2P0eRbF+pSLY/W5Fsf5Yi2X5wmeTlNztIkWxfoUi2" +
    "zyqS7TOKZPtYkWyfViTbR4pk+1CRbJ9ShO0zgTHx9EsAxC8Lds94ZcHqGbcs2DzjlAWLZ+yyYO+M" +
    "VRasnTHLgq0zRlmwdCZZFuw8cP6/L3k0Eb8RvxD/MP5mfFPp9L83XhcvjKfGQ2Ir/Xbp7P94+t70" +
    "Lemr0wfSG9OL0/n0iLQXvRO9Gj0VPRjdGl0THYy2ls79NdHoKAw/CE+ET4cPhbeH14e94bZwRTg7" +
    "HBdmUn9LvZ56rnTmvzN1Q+pYameqJTUvNTE1OPgkOBk8Hzwa3B0cD/qCPcHaoKF03j8nMP23/Jf8" +
    "x/xv+Tf7n/b3+xv8RX6VP9x3vb94v/F+4j1QOut/1uvxtnhLvJlezku577uvuT93v+N+1b3OPeJ2" +
    "uMvdOnesG5dO+n9wnnUedu5wPu9c7uxwVjlznQnOIPtj+4/2r+wf2HfZN9qfsnfba+x6e7JdaRvW" +
    "m9aL1o+te6wvWldZBWu91WhNt4ZZjvln8xXzSfN+80vmZ8xuc7PZZM4wR5mB8Z7xW+NnxreN24xr" +
    "jcNGu7HMqDXGGOnkh8nfJ59Jfjf5teTnSl/if52Konoiq6ZjYXEPUB6hiruB8gxVvBQoD1HFXUB5" +
    "Giyqx7JqOhYWdwDlebC4HSgPhMVOoDwRFrcB5ZGw2AGkonYgFbUBqWgrkIq2AKlos0I6FhY3Aalo" +
    "I5CKNgCpaD2Qii4BUtE6IBWtBVLRGiAVrQZSUatCOhYWW4BUtApIRSuBVHQxkIpWAKloOZCKlgGp" +
    "qBlIRUuBVLREIR0Li01AKroISEWLgVS0CEhFjUAquhBIRQuBVNQApKJ6IBUtUEjHw+J8IBXNA1LR" +
    "XCAVzQFS0QVAKpoNpKI6IBXVAqloFpCK1PVfNR0UizOBVDQDSEXVQCrKA6moCkhF04FUNA1IRVOB" +
    "VDQFSEXq+i9fR0WTgFR0PpCKJgKpaAKQis4DUtF4IBWNA1LRWCAVjQFSkbr+y9dS0WggFeWAVDQK" +
    "SEUjgVQ0AkhFw4FUNAxIRUOBVDQESEXq+i9PV8nFSiAVnQ2korOAVDQYSEWDgFRUAaSiLJCKMkAq" +
    "ioFUpK7/8nSVXIyAVBQCqSgFpKIASEU+kIo8IBW5QCpygFRkA6lIXf/l+ZnBBFKRAaSiJJCKEkC6" +
    "prwSSNeUVwDpmvIYkK4pLwfSNeVRIF1TqkvAPF8l9wLpmvIIkC5eDwPp4vUQkIoOAqmoB0hF3UAq" +
    "6gJS0QEgFanrwDxfJReAVLQPSEV7gVS0B0hFu4FUdCmQinYBqWgnkIp2AKlIPX/m+Sq5E0hF24BU" +
    "1AGkonYgFbUBqWgrkIq2AKloM5CKNgGpSD1/5umZoW8DkIrWA6noEiAVrQNS0VogFa0BUtFqIBW1" +
    "AqmoBUhF6vkzT88MfSuBVHQxkIpWAKloOZCKlgGpqBlIRUuBVLQESEVNQCpSz59V9MzQtxhIRYuA" +
    "VNQIpKILgVS0EEhFDUAqqgdS0QIgFc0HUtE8fAeXiuYCa/n8PyYa/V86/+sfrNCjR48ePXr06NGj" +
    "R8//8VT0q0vAajoc9sdAORz2p4FyOOyPgHI47A+BcjjsTwHlcNgfAOVw2O8D5XDY7wHlcNjvAuVw" +
    "2K8uAavpcNhvA6nIAlKRCaQiA0hFSSAVJYB0WXklkC4rrwDSZeUxIF1WqkvAar5QPgqky8rLgHRZ" +
    "2Quky8ojQLp+PQyk69dDQCo6CKSiHiAVdQOpqAvfx6WiA0Aq2g+kogKQivYBUfQP+ArnLwCAAAA="

  private def realDb: Array[Byte] = {
    val gz = java.util.Base64.getDecoder.decode(realDbGz)
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(gz))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  test("parses a CPython-made db: tables, types, overflow, interior pages") {
    val tables = Sqlite.parse(realDb).map(t => t.name -> t).toMap
    assert(tables.keySet == Set("people", "notes"))
    val people = tables("people")
    assert(people.columns == Vector("name", "age", "score", "bio"))
    assert(people.rows.length == 2)
    assert(people.rows(0) == Vector("Alice", "30", "1.5", "short bio"))
    val bob = people.rows(1)
    assert(bob(0) == "Bob" && bob(1) == "-7" && bob(2) == "2.25")
    assert(bob(3).length == 9002 && bob(3).startsWith("L") && bob(3).endsWith("R"))
    assert(bob(3).drop(1).dropRight(1).forall(_ == 'x'))
    val notes = tables("notes")
    assert(notes.rows.length == 400)
    assert(notes.rows(0) == Vector("note 0 content"))
    assert(notes.rows(399) == Vector("note 399 content"))
  }

  test("writer roundtrip incl. multi-page tables") {
    val rows = (0 until 500).map(i => Seq(s"alpha$i", s"beta$i", s"gamma$i"))
    val bytes = Sqlite.write("docs", Seq("a", "b", "c"), rows)
    val t = Sqlite.parse(bytes)
    assert(t.length == 1)
    assert(t.head.name == "docs")
    assert(t.head.columns == Vector("a", "b", "c"))
    assert(t.head.rows.length == 500)
    assert(t.head.rows(0) == Vector("alpha0", "beta0", "gamma0"))
    assert(t.head.rows(499) == Vector("alpha499", "beta499", "gamma499"))
  }

  test("extractor: sheets + rowCount + row spans (tabular/sqlite.py contract)") {
    val bytes = Sqlite.write("docs", Seq("a", "b"),
      Seq(Seq("hello", "world"), Seq("42", "answer")))
    val r = SqliteExtractor.extract(RawDoc("d", "x.sqlite",
      "application/x-sqlite3", bytes))
    assert(r.status == ExtractionResult.Success, r.error)
    assert(r.properties.getOrElse("sheets", Nil) == Seq("docs"))
    assert(r.properties.getOrElse("rowCount", Nil).headOption.contains("3"))
    assert(r.spans.map(_.text) == Vector("hello world", "answer")) // 42 filtered
  }

  test("garbage is a clean failure") {
    intercept[ProcessingError](Sqlite.parse("not a database at all".getBytes))
    val r = SqliteExtractor.extract(RawDoc("d", "x.db", "", new Array[Byte](200)))
    assert(r.status == ExtractionResult.Failure)
  }
}
