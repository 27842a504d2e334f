"""Multi-language identification kernel + Spark operator tests."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from llmap_spark.operators.langid import (LANGUAGES, MARKERS, SCRIPT_SINGLE,
                                          detect_language, lang_id2)


def test_language_surface_is_wide():
    # the r4-verdict ask: >= 20 languages incl. CJK/Cyrillic/Arabic
    assert len([l for l in LANGUAGES if l != "und"]) >= 25
    for lang in ("zh", "ja", "ko", "ru", "ar", "hi", "th", "he", "el"):
        assert lang in LANGUAGES


def test_single_script_languages_decide_by_script():
    cases = {
        "ko": "이것은 테스트 페이지의 주요 내용입니다",
        "th": "นี่คือหน้าทดสอบที่มีเนื้อหาหลัก",
        "el": "αυτό είναι μια δοκιμαστική σελίδα",
        "he": "זהו דף בדיקה עם תוכן עיקרי",
        "hi": "यह मुख्य सामग्री वाला परीक्षण पृष्ठ है",
        "bn": "এটি একটি পরীক্ষা পৃষ্ঠা",
        "ta": "இது சோதனை பக்கம்",
        "ka": "ეს არის ტესტის გვერდი",
        "hy": "սա փորձնական էջ է",
    }
    for lang, text in cases.items():
        got = detect_language(text)
        assert got[0] == lang, (lang, got)
        assert got[1] == {v: k for k, v in SCRIPT_SINGLE.items()}[lang]


def test_han_resolves_zh_vs_ja_by_kana():
    assert detect_language("这是一个测试页面的主要内容")[0] == "zh"
    # kanji-dominant but kana present -> ja
    assert detect_language("日本語の文章ですこれは内容")[0] == "ja"
    # kana-dominant is ja via the kana script directly
    assert detect_language("これはテストページです")[0] == "ja"


def test_marker_languages_argmax():
    cases = {
        "en": "the report and the data of the case that is ready",
        "de": "der bericht und die daten das ist nicht mit ein problem",
        "fr": "le rapport est dans une page que les notes pour des cas",
        "ru": "и в не на что это как по страница",
        "uk": "і що це як та але від щоб сторінка",
        "ar": "في من على أن إلى عن هذا التي صفحة",
        "fa": "که این است با را های برای آن صفحه",
        "tr": "bir ve bu için ile olarak daha çok sayfa",
        "vi": "và của là có không được người trong trang",
    }
    for lang, text in cases.items():
        assert detect_language(text)[0] == lang, lang


def test_no_evidence_is_und_not_a_guess():
    # latin letters but no marker words anywhere
    assert detect_language("zzz qqq xxyzzy blorp")[0] == "und"
    # cyrillic letters, no markers
    assert detect_language("зжщ фыва йцукен")[0] == "und"
    assert detect_language(None) == ("und", "none", 0)
    assert detect_language("") == ("und", "none", 0)
    assert detect_language("12345 --- !!! 678") == ("und", "none", 0)


def test_dominant_script_wins_mixed_text():
    # a mostly-Russian page with a short English phrase stays ru
    text = ("и в не на что это как по " * 5) + "click here"
    assert detect_language(text)[0] == "ru"
    # and the mirror case stays en
    text2 = ("the and of to that is for with " * 5) + "привет"
    assert detect_language(text2)[0] == "en"


def test_tie_breaks_are_fixed_order():
    # 'je' is a cs marker; 'se'/'na' shared cs — equal-score ties must
    # break to the earlier language in the script list deterministically
    got1 = detect_language("je se na")
    got2 = detect_language("je se na")
    assert got1 == got2
    # marker lists are non-empty and duplicate-free per language
    for script, langs in MARKERS.items():
        for lang, words in langs:
            assert len(words) == len(set(words)), (script, lang)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_kernel_total_on_arbitrary_unicode(s):
    lang, script, n = detect_language(s)
    assert lang in LANGUAGES
    assert isinstance(n, int) and n >= 0
    # determinism
    assert detect_language(s) == (lang, script, n)


def test_spark_udf_matches_kernel(spark):
    """The Spark operator calls THE SAME kernel: row-for-row identical
    output on a mixed corpus (the no-fork invariant)."""
    texts = [
        "the report and the data of the case",
        "der bericht und die daten",
        "и в не на что это как по",
        "في من على أن إلى عن",
        "これはテストページです",
        "이것은 테스트 페이지",
        "这是一个测试页面的主要内容",
        None, "", "12345", "zzz qqq",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r.doc_id: (r.pred_lang, r.pred_script, r.n_letters)
           for r in lang_id2(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == detect_language(t), (i, t)
