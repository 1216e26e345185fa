"""Byte-identical extraction invariant (BASELINE.json input_hint;
SURVEY.md §5.2.3): the engine's distributed mapInPandas extractor must
reproduce the reference spec extractor byte-for-byte per (url, warc_ts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from feast_spark.extract_spec import extract_text
from feast_spark.operators.text import (
    char_class_ratios_pandas,
    extract_text_col,
    quality_features,
)


def test_engine_extraction_byte_identical(spark, pages_df):
    """pages.text was produced by the serial spec extractor at datagen
    time; the engine must reproduce it from html exactly."""
    out = extract_text_col(pages_df.select("url", "warc_ts", "html", "text"))
    mismatches = out.filter(
        F.encode("extracted_text", "utf-8") != F.encode("text", "utf-8")
    ).count()
    assert mismatches == 0


def test_spec_extractor_handles_edge_cases():
    assert extract_text(b"") == ""
    assert extract_text(b"<p>a&amp;b</p>") == "a&b"
    assert extract_text(b"<script>x<p>no</p></script>visible") == "visible"
    assert extract_text(b"<style>p{}</style><p> a   b </p>") == "a b"
    assert extract_text("<p>snow &#x2603;</p>") == "snow ☃"
    # script is raw-text (HTML5 CDATA): the FIRST </script> closes it,
    # and the stray second closer is ignored (depth guard)
    assert (
        extract_text(b"<script><script></script>visible</script>ok")
        == "visibleok"
    )
    # non-CDATA skip tags DO nest via the depth counter
    assert (
        extract_text(b"<template>a<template>b</template>c</template>d") == "d"
    )
    # invalid utf-8 → replacement char, never an exception
    assert "�" in extract_text(b"<p>\xff\xfe</p>")
    # block boundaries become newlines, inline tags flow
    assert extract_text(b"<h1>t</h1><p>a <b>b</b> c</p>") == "t\na b c"


def test_fused_kernel_matches_unfused_path(spark, pages_df):
    """extract_features_col (fused Arrow kernel, the bench hot path) must
    equal extract_text_col + quality_features (the JVM-expression path)
    on every shared column, and its optional text output must stay
    byte-identical to the spec."""
    from feast_spark.operators.text import extract_features_col

    src = pages_df.select("url", "warc_ts", "html", "text")
    fused = extract_features_col(src, include_text=True)
    unfused = quality_features(
        extract_text_col(src)
        .drop("text")
        .withColumnRenamed("extracted_text", "text")
    )
    cols = [
        "q_n_chars", "q_n_tokens", "q_punct_ratio", "q_digit_ratio",
        "q_upper_ratio", "q_stopword_ratio",
    ]
    a = fused.select("url", "warc_ts", *cols)
    b = unfused.select(
        "url", "warc_ts",
        *[F.round(c, 9).alias(c) if "ratio" in c else F.col(c) for c in cols],
    )
    a = a.select(
        "url", "warc_ts",
        *[F.round(c, 9).alias(c) if "ratio" in c else F.col(c) for c in cols],
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # byte-identity of the optional text output
    assert (
        fused.filter(
            F.encode("extracted_text", "utf-8") != F.encode("text", "utf-8")
        ).count()
        == 0
    )


def test_quality_features_jvm_vs_pandas(spark, pages_df):
    """The JVM punct_ratio expression must equal the Arrow/pandas kernel
    (cross-check of the two vectorized paths)."""
    df = quality_features(pages_df.select("url", "warc_ts", "text"))
    df = char_class_ratios_pandas(df)
    bad = df.filter(
        F.abs(F.col("q_punct_ratio") - F.col("q_punct_ratio_py")) > 1e-9
    ).count()
    assert bad == 0


def test_quality_features_values(spark):
    df = spark.createDataFrame(
        [("the cat, IS 42!",)], "text string"
    )
    row = quality_features(df).first()
    assert row["q_n_chars"] == 15
    assert row["q_n_tokens"] == 4
    # punct: , !  → 2/15 ; digits: 4 2 → 2/15 ; upper: I S → 2/15
    assert abs(row["q_punct_ratio"] - 2 / 15) < 1e-9
    assert abs(row["q_digit_ratio"] - 2 / 15) < 1e-9
    assert abs(row["q_upper_ratio"] - 2 / 15) < 1e-9
    # stopwords: the, is → 2/4
    assert abs(row["q_stopword_ratio"] - 0.5) < 1e-9


def test_fast_path_equals_htmlparser():
    """The tiered extractor (regex tokenizer → goahead mirror →
    HTMLParser) must be byte-identical to the reference parser on
    adversarial constructs and random tag soup. Tiers decline rather
    than approximate; this pins the 'decline or match exactly' rule."""
    import random

    from feast_spark.extract_spec import (
        _fast_extract,
        _fastest_extract,
        _slow_extract,
        extract_text,
    )

    cases = [
        "", "<", "a < b", "plain &amp; more", "<p>x</p>", "<P>X</P>",
        "<br/><br />", "<div class='a>b'>in</div>", '<div title="a>b">q</div>',
        "<script>var x='<p>n</p>'; if(x<3){}</script>a", "<script>untermin",
        "<style>.x > p{}</style>t", "<!-- c --><p>y</p>", "<!DOCTYPE html><p>z",
        "<?php ?>w", "<!bogus>v", "</>u", "</ weird>t", "</3>s",
        "<noscript><p>h</p></noscript>s", "<template><div>t</div></template>o",
        "<p a=1 b=2>at</p>", "<p a = '1' b=\"2\">q</p>", "<p a=1/>x",
        "<p a=1 />y", "<p/ >z", "<p / >w", "&#x2603; &notareal; &amp m", "&",
        "x &", "<p>&lt;t&gt;</p>", "<SCRIPT>X</SCRIPT>d", "< p>nt</ p>",
        "<p/>s", "<ul><li>a<li>b</ul>", "text<", "<p", "<p att", '<p att="',
        "<script>a</script  >b</script>c", "&#;", "&#x;", "<p a==b>x</p>",
        '<p "a>b">q', "<p a=b\"c>r", "</p/>k", "</p attr>m", "<x-tag>c</x-tag>",
        "<a b='c'/>d", "<!--->e", "<!-- -- >f-->g", "<![CDATA[x]]>h",
    ]
    for c in cases:
        want = _slow_extract(c)
        assert extract_text(c) == want, repr(c)
        for tier in (_fastest_extract, _fast_extract):
            got = tier(c)
            assert got is None or got == want, (tier.__name__, repr(c))

    rng = random.Random(7)
    toks = [
        "<p>", "</p>", "<div>", "</div>", "<b>", "</b>", "text ", "&amp;",
        "&#x41;", "&", "<", ">", " ", "\n", "\t", "<script>", "</script>",
        "<style>", "</style>", "<!-- x -->", "<br/>", "<a href='u'>", "</a>",
        "<!DOCTYPE html>", "<?pi?>", "</ x>", "<3", "word", "&#9731;",
        "<noscript>", "</noscript>", "<td>", "</td>", "'", '"', "=", "/",
    ]
    for _ in range(800):
        doc = "".join(rng.choice(toks) for _ in range(rng.randint(0, 30)))
        assert extract_text(doc) == _slow_extract(doc), repr(doc)


def test_gopher_rules_and_repetition(spark):
    """Semantic checks on the Gopher/C4 quality signals: planted garbage
    fails the specific rule it violates; clean prose passes all."""
    from pyspark.sql import Row

    from feast_spark.operators.text import (
        gopher_quality_features,
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="- one\n- two\n- three\n- four"),   # all bullets
            Row(doc_id=3, text="a b c d e f g h i j"),              # 1-char words
            Row(doc_id=4, text="### ## # #tag #x #y"),              # symbol soup
            Row(doc_id=5, text="line\nline\nline\nother"),          # dup lines
            Row(doc_id=6, text="spam spam spam spam spam spam"),    # repeated gram
        ]
    )
    g = {r["doc_id"]: r for r in gopher_quality_features(docs).collect()}
    assert g[1]["gopher_keep"] is True
    assert g[2]["bullet_line_frac"] == 1.0 and g[2]["gopher_keep"] is False
    assert g[3]["mean_word_len"] == 1.0 and g[3]["gopher_keep"] is False
    assert g[4]["symbol_word_ratio"] > 0.5 and g[4]["gopher_keep"] is False

    r = {x["doc_id"]: x for x in repetition_stats(docs).collect()}
    assert r[5]["dup_line_frac"] == 0.5
    assert r[6]["top_ngram_char_frac"] == 1.0  # clamped overlap
    assert r[1]["top_ngram_char_frac"] < 0.3


def test_canonical_url_normalization(spark):
    from feast_spark.operators.text import canonical_url

    cases = [
        ("HTTPS://Example.COM/Path?utm_source=x&b=2&a=1#frag",
         "https://example.com/Path?a=1&b=2"),
        ("http://a.b/c", "http://a.b/c"),
        ("http://a.b/c?utm_campaign=z&gclid=1", "http://a.b/c"),
        ("http://a.b/c?z=9&fbclid=123&y=8", "http://a.b/c?y=8&z=9"),
        ("http://A.B/", "http://a.b/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["cu"] for r in df.select(canonical_url("url").alias("cu")).collect()]
    assert got == [w for _, w in cases]


def test_pii_redaction_semantics(spark):
    from pyspark.sql import Row

    from feast_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            Row(t="mail me at jo.doe+x@sub.example.org please"),
            Row(t="server at 192.168.0.1 and 8.8.8.8"),
            Row(t="call +1 555 0123 456 today"),
            Row(t="no pii here at all"),
        ]
    )
    got = [r["c"] for r in df.select(redact_pii("t").alias("c")).collect()]
    assert got[0] == "mail me at <EMAIL> please"
    assert got[1] == "server at <IP> and <IP>"
    assert "<PHONE>" in got[2] and "555" not in got[2]
    assert got[3] == "no pii here at all"


def test_contamination_planted_overlap(spark):
    """A corpus doc embedding a benchmark 13-gram is flagged; disjoint
    docs are not; the benchmark side broadcasts (plan check)."""
    from pyspark.sql import Row

    from feast_spark.operators.text import ngram_contamination

    bench_text = " ".join(f"b{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="x " + " ".join(f"b{i}" for i in range(13)) + " y"),
            Row(doc_id=2, text=" ".join(f"c{i}" for i in range(30))),
            Row(doc_id=3, text=bench_text),
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=99, text=bench_text)])
    out = ngram_contamination(corpus, bench, n=13)
    hits = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert 1 in hits and 3 in hits and 2 not in hits
    assert hits[3] == 8  # 20 words -> 8 distinct 13-grams, all shared
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_lang_id_recall_multilingual(spark):
    """VERDICT r03 next #6: the 22-language weighted marker table must
    identify every covered language on a native-function-word fixture,
    keep first-wins tie semantics, and emit 'zz' on marker-free text."""
    from pyspark.sql import Row

    from feast_spark.operators.text import _LANG_MARKERS, lang_id, lang_table

    langs, vocab, weights = lang_table()
    assert len(langs) >= 20
    # per-token weights: a token shared by k languages carries 2^-(k-1)
    i_det = vocab.index("det")  # sv + da + no
    assert sorted(w for w in weights[i_det] if w) == [0.25, 0.25, 0.25]
    i_the = vocab.index("the")  # en only
    assert [w for w in weights[i_the] if w] == [1.0]

    sentences = {
        "en": "the report was written for the team and that is why",
        "de": "der Bericht ist nicht einfach und die Arbeit mit sich",
        "fr": "le rapport est dans les archives et pas pour une fois",
        "es": "el informe es para los lectores pero que una vez por",
        "pt": "os dados não são para uma leitura como dos outros das",
        "it": "il rapporto che sono anche della squadra per una più",
        "nl": "het verslag is een werk van de mensen dat niet zijn met",
        "sv": "och det är som en rapport på svenska av och för med",
        "da": "og det er ikke en rapport til af på dansk med og",
        "no": "og det er ikke en rapport som jeg av til på norsk",
        "fi": "ja se on että hän ei oli mutta niin kun raportti",
        "pl": "nie jest że się czy dla tym jak po raport na",
        "cs": "se na je že ale jako aby jsou ke zpráva pro",
        "ro": "și în la cu este pe care nu din raport sunt",
        "hu": "az és hogy nem is egy van volt ez jelentés meg",
        "tr": "ve bir bu rapor için ne gibi çok ama daha var",
        "id": "yang dan di itu dengan untuk tidak ini dari akan",
        "vi": "của và các có được trong là cho không người",
        "ru": "и в не на что он с как это по отчет",
        "uk": "і в не на що він з як це по звіт",
        "el": "και το να του η με την δεν ο που αναφορά",
        "ar": "في من على أن إلى هذا التي كان لا ما التقرير",
    }
    assert set(sentences) == set(_LANG_MARKERS)
    rows = [Row(lang=l, text=t) for l, t in sentences.items()]
    rows.append(Row(lang="zz", text="xylophone zebra quartz 12345"))
    got = {
        r["lang"]: r["pred"]
        for r in spark.createDataFrame(rows)
        .select("lang", lang_id("text").alias("pred"))
        .collect()
    }
    wrong = {l: p for l, p in got.items() if l != p}
    assert not wrong, wrong


def test_lang_id_cjk_script_gate(spark):
    """VERDICT r04 next #8: zh/ja/ko have no word spaces, so the marker
    model can never fire — docs that are substantially CJK classify by
    script counts (segmentation-free). Pins: recall on native zh/ja/ko
    prose; a Latin doc QUOTING a little CJK keeps its marker prediction;
    the documented all-kanji→zh boundary; gate arithmetic is exact."""
    from pyspark.sql import Row

    from feast_spark.operators.text import (
        CJK_GATE_DENOM, CJK_KANA_DENOM, lang_id,
    )

    fixtures = [
        # unsegmented native prose (Han-only vs kana-mixed vs hangul)
        Row(lang="zh", text="这是一份关于数据处理系统的技术报告，包含性能测试结果。"),
        Row(lang="ja", text="これはデータ処理システムに関する技術報告書です。性能試験の結果を含みます。"),
        Row(lang="ko", text="이것은 데이터 처리 시스템에 관한 기술 보고서입니다. 성능 시험 결과를 포함합니다."),
        # katakana-heavy ja (loanword prose) still gates to ja
        Row(lang="ja", text="コンピュータシステムのパフォーマンステストレポート"),
        # an English page quoting a LITTLE Chinese stays marker-predicted
        Row(
            lang="en",
            text="the report was written for the team and that is why "
                 'the title says "数据报告" in the original language',
        ),
        # all-kanji fragment (no kana): documented boundary → zh
        Row(lang="zh", text="東京大学工学部計算機科学科研究報告書第三号"),
    ]
    got = [
        (r["lang"], r["pred"])
        for r in spark.createDataFrame(fixtures)
        .select("lang", lang_id("text").alias("pred"))
        .collect()
    ]
    wrong = [(l, p) for l, p in got if l != p]
    assert not wrong, wrong
    # the gate constants are the documented contract
    assert CJK_GATE_DENOM == 3 and CJK_KANA_DENOM == 10


def test_lang_id_oracle_mirrors_cjk_gate(spark, tmp_path):
    """The generated DuckDB oracle must agree with Spark bit-for-bit ON
    GATED ROWS — the testdata documents tables contain no CJK, so the
    driver's own comparison never exercises the gate branch; this pins
    the two regex dialects (java char-class vs RE2 \\x{..}) and the
    integer gate arithmetic against each other on a CJK+Latin fixture."""
    import duckdb
    from pyspark.sql import Row

    import __spark_entry__ as entrymod
    from feast_spark.operators.text import lang_id

    rows = [
        Row(doc_id=1, text="这是一份关于数据处理系统的技术报告，包含性能测试结果。"),
        Row(doc_id=2, text="これはデータ処理システムに関する技術報告書です。"),
        Row(doc_id=3, text="이것은 데이터 처리 시스템에 관한 기술 보고서입니다."),
        Row(doc_id=4, text='the report was written for the team and "数据" too'),
        Row(doc_id=5, text="東京大学工学部計算機科学科研究報告書第三号"),
        Row(doc_id=6, text="der Bericht ist nicht einfach und die Arbeit mit sich"),
        Row(doc_id=7, text="コンピュータシステムのパフォーマンステストレポート"),
        Row(doc_id=8, text="xylophone zebra quartz 12345"),
    ]
    df = spark.createDataFrame(rows)
    p = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(p)
    got_spark = {
        r["doc_id"]: r["lang_pred"]
        for r in df.select("doc_id", lang_id("text").alias("lang_pred")).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    got_duck = dict(con.execute(entrymod._lang_id_oracle()).fetchall())
    assert got_spark == got_duck, {
        k: (got_spark[k], got_duck.get(k))
        for k in got_spark
        if got_spark[k] != got_duck.get(k)
    }
    assert got_spark[2] == "ja" and got_spark[5] == "zh"  # gate fired


def test_perplexity_lm_semantics(spark):
    """CCNet-style char-LM scoring (operators/text.py char_ngram_lm /
    perplexity_score / perplexity_buckets): in-domain text scores lower
    cross-entropy than gibberish; short docs fall back to pure-OOV
    h = ln(V); thresholds and ntile paths agree on ordering."""
    import math

    from pyspark.sql import Row

    from feast_spark.operators.text import (
        char_ngram_lm,
        perplexity_buckets,
        perplexity_score,
    )

    ref_rows = [
        Row(text="the quick brown fox jumps over the lazy dog and then "
                 "the dog runs home to the house near the river")
    ] * 3
    lm = char_ngram_lm(spark.createDataFrame(ref_rows), order=3)
    gram_counts, ctx_counts, alphabet = lm
    assert alphabet > 5

    docs = spark.createDataFrame([
        Row(doc_id=1, text="the dog runs to the house near the river"),
        Row(doc_id=2, text="zxq vw kjy pqz xxj wqk zzv qqp jjx kkz"),
        Row(doc_id=3, text="ab"),  # shorter than order: zero grams
    ])
    got = {r["doc_id"]: r for r in perplexity_score(docs, lm).collect()}
    assert got[1]["h"] < got[2]["h"]  # in-domain beats gibberish
    assert got[3]["n_grams"] == 0
    assert abs(got[3]["h"] - math.log(alphabet)) < 1e-12

    by_h = sorted(got, key=lambda d: (got[d]["h"], d))
    want = dict(zip(by_h, ["head", "middle", "tail"]))
    thr = perplexity_buckets(
        docs, lm,
        thresholds=(got[by_h[0]]["h"] + 1e-9, got[by_h[1]]["h"] + 1e-9),
    )
    lab = {r["doc_id"]: r["bucket"] for r in thr.collect()}
    assert lab == want
    nt = perplexity_buckets(docs, lm)  # exact equal-thirds path
    lab_nt = {r["doc_id"]: r["bucket"] for r in nt.collect()}
    assert lab_nt == want


def test_blocklist_filter(spark):
    from pyspark.sql import Row

    from feast_spark.operators.text import blocklist_filter

    rows = [
        Row(doc_id=0, url="https://Spam.Example.COM/a", text="clean"),
        Row(doc_id=1, url="https://ok.org/b", text="clean"),
        Row(doc_id=2, url="https://ok.org/c", text="has ZZYZX inside"),
        Row(doc_id=3, url="https://ok.org/d", text="zzyzxy superstring"),
        Row(doc_id=4, url="not a url", text="clean"),          # NULL domain
        Row(doc_id=5, url="https://ok.org/e", text=None),      # NULL text
        Row(doc_id=6, url="https://www.sub.example.com/f", text="clean"),
    ]
    df = spark.createDataFrame(rows)
    out = blocklist_filter(
        df, blocked_domains=["Example.COM"], banned_phrases=["zzyzx"]
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 0/6 blocked by domain (case + subdomain folded); 2 by phrase
    # (case-insensitive); 3 kept (word boundary); 4/5 kept (NULL
    # domain / NULL text never match)
    assert kept == [1, 3, 4, 5]
    # DataFrame blocklist variant, unbroadcast path: identical rows
    bl = spark.createDataFrame([Row(domain="example.com")])
    out2 = blocklist_filter(
        df, blocked_domains=bl, banned_phrases=["zzyzx"],
        broadcast_blocklist=False,
    )
    assert sorted(r["doc_id"] for r in out2.collect()) == kept


def test_blocklist_punctuation_edged_phrases(spark):
    """r04 review: \\b needs an adjacent word char, so an unconditional
    \\b(...)\\b made every punctuation-edged phrase ('f***', '$$$ win')
    silently inert. Boundaries are now attached per edge, only where a
    word char makes one possible."""
    from pyspark.sql import Row

    from feast_spark.operators.text import blocklist_filter

    rows = [
        Row(doc_id=0, text="totally f*** here"),    # punct-final phrase
        Row(doc_id=1, text="win $$$ now fast"),     # punct-initial phrase
        Row(doc_id=2, text="fine text"),            # clean
        Row(doc_id=3, text="suffix offer$$$ now"),  # '$$$ now' matches too
        Row(doc_id=4, text="bad-word inside"),      # word-edged, bounded
        Row(doc_id=5, text="notbad-wordy"),         # boundary still holds
    ]
    df = spark.createDataFrame(rows)
    out = blocklist_filter(
        df, text_col="text",
        banned_phrases=["f***", "$$$ now", "bad-word"],
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 5]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty phrase"):
        blocklist_filter(df, text_col="text", banned_phrases=["x", ""])


def test_normalize_text_semantics(spark):
    from pyspark.sql import Row

    from feast_spark.operators.text import normalize_text

    rows = [
        Row(i=0, t="éclair  au\tcafé"),  # decomposed accents
        Row(i=1, t="  a\x01b\x1fc  "),               # control bytes
        Row(i=2, t=None),
        Row(i=3, t="already clean"),
    ]
    df = spark.createDataFrame(rows)
    got = {r["i"]: r["n"] for r in df.select(
        "i", normalize_text("t").alias("n")).collect()}
    assert got[0] == "éclair au café"  # composed, one space
    assert got[1] == "a b c"
    assert got[2] is None
    assert got[3] == "already clean"
    # idempotent: normalizing a normalized string is the identity
    again = {r["i"]: r["n2"] for r in df.select(
        "i", normalize_text(normalize_text("t")).alias("n2")).collect()}
    assert again == got


def test_hashed_bow_logit_exact_reference(spark):
    """fastText-style hashed BoW classifier: the Spark logit must equal
    a pure-Python reference EXACTLY (dyadic weights make the sum
    order-independent), including whitespace, unicode, empty and NULL
    edges — bit-for-bit reproducibility is the operator's contract."""
    import hashlib

    from pyspark.sql import Row

    from feast_spark.operators.text import (
        demo_quality_weights, hashed_bow_logit,
    )

    w = demo_quality_weights(64)
    docs = [
        "the quick brown fox",
        "  Spaced   TEXT here ",   # trim + lower + interior empties
        "único crème naïve",       # utf-8 tokens hash over their bytes
        "",                        # one empty token after split
    ]
    rows = [Row(i=i, t=t) for i, t in enumerate(docs)] + [Row(i=99, t=None)]
    df = spark.createDataFrame(rows, "i int, t string")
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", hashed_bow_logit("t", w).alias("z")
        ).collect()
    }

    def ref(t):
        toks = t.strip().lower().split(" ")
        s = 0.0
        for tok in toks:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % len(w)
            s += w[b]
        return s / len(toks)

    for i, t in enumerate(docs):
        assert got[i] == ref(t), (i, got[i], ref(t))
    assert got[99] is None
    # keep-decision threshold is on the logit, no exp anywhere
    kept = df.select(
        "i", (hashed_bow_logit("t", w) > 0).alias("keep")
    ).collect()
    assert {r["i"]: r["keep"] for r in kept}[99] is None
