"""Lockstep fuzz (hypothesis, duckdb in-process) for the textops/blocks
kernels — the same guard the extractor families carry: the pure Python
kernel vs an EXACT replay of its gate-oracle SQL on arbitrary input.
The fixed gate data (synth docs) can never exercise re-vs-RE2-vs-DuckDB
edge shapes (CRLF lines, 7-hash headings, fence-inside-fence, non-ASCII
letters, NBSP); these fuzzers can.

Kernels covered (gate pairs in pipelines/queries.py):
- stages/blocks.doc_blocks        <-> Q_DOC_BLOCK_HIERARCHY_SQL line rules
- functions/text.detect_language  <-> Q_DOC_LANGID_SQL decision CASE
- functions/text.quality_features <-> Q_DOC_QUALITY_SQL ratio exprs
- functions/text.token_count      <-> Q_DOC_STATS_SQL token rule
"""

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from coco_search_ray.functions.text import (
    detect_language,
    quality_features,
    token_count,
)
from coco_search_ray.stages.blocks import doc_blocks

# ---------------------------------------------------------------- blocks

# line-shaped strategy: the classifier is a per-line state machine, so
# build docs from lines that hit every rule boundary (fences, headings
# at depths 1/6/7, list items, blanks, CR-terminated lines, prose)
_LINE = st.one_of(
    st.just(""),
    st.just("```"),
    st.just("```python"),
    st.sampled_from(["# h1", "## h2", "###### h6", "####### too-deep",
                     "#nospace", "# ", "#", "- item", "-nospace", "- "]),
    st.text(alphabet="ab# `-é\t\r", max_size=8),
)
_DOC = st.lists(_LINE, max_size=12).map("\n".join)

_BLOCKS_SQL = r"""
WITH l AS (
  SELECT generate_subscripts(string_split(text, chr(10)), 1) - 1 AS line_no,
         unnest(string_split(text, chr(10))) AS line
  FROM tt
), f AS (
  SELECT line_no, line,
         CASE WHEN line LIKE '```%' THEN 1 ELSE 0 END AS is_fence
  FROM l
), g AS (
  SELECT *,
         coalesce(sum(is_fence) OVER (
           ORDER BY line_no
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fences_before
  FROM f
), c AS (
  SELECT line_no,
         CASE WHEN is_fence = 1 THEN 'fence'
              WHEN fences_before % 2 = 1 THEN 'code'
              WHEN line = '' THEN 'blank'
              WHEN regexp_matches(line, '^#{1,6} ') THEN 'heading'
              WHEN line LIKE '- %' THEN 'list_item'
              ELSE 'text' END AS block_type,
         CASE WHEN is_fence = 0 AND fences_before % 2 = 0 AND regexp_matches(line, '^#{1,6} ')
              THEN regexp_extract(line, '^(#{1,6}) (.*)$', 2) END AS h_title,
         CASE WHEN is_fence = 0 AND fences_before % 2 = 0 AND regexp_matches(line, '^#{1,6} ')
              THEN length(regexp_extract(line, '^(#{1,6}) (.*)$', 1)) END AS h_depth
  FROM g
)
SELECT line_no, block_type,
       coalesce(last_value(h_title IGNORE NULLS) OVER (
         ORDER BY line_no
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), '') AS heading,
       coalesce(last_value(h_depth IGNORE NULLS) OVER (
         ORDER BY line_no
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS depth
FROM c ORDER BY line_no
"""


@given(_DOC)
@settings(max_examples=250, deadline=None)
def test_doc_blocks_lockstep_with_duckdb(text):
    """doc_blocks' per-line (block_type, heading, depth) equals the
    Q_DOC_BLOCK_HIERARCHY_SQL classifier replay, line by line."""
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([text], pa.string())})
    out = doc_blocks(batch).to_pylist()
    got = [(r["line_no"], r["block_type"], r["heading"], r["depth"]) for r in out]

    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE tt(text VARCHAR)")
    con.execute("INSERT INTO tt VALUES (?)", [text])
    if not text:
        # the pipeline skips empty docs; the gate SQL filters text <> ''
        assert got == []
        con.close()
        return
    want = [(r[0], r[1], r[2], int(r[3])) for r in con.execute(_BLOCKS_SQL).fetchall()]
    con.close()
    assert got == want


# ------------------------------------------------------- langid / quality

_STOPWORDS = (
    "the and of to a in is it you that was for on are with as i his they be at "
    "der die und den von zu das mit sich des auf ist im dem nicht ein "
    "le de la et les des en un du une que est pour qui dans par "
    "el y los se del las por con no una su"
).split()

# word-shaped strategy: stopword hits drive the langid decision, so draw
# tokens from the stopword union plus noise words (incl. non-ASCII and
# punctuation-glued shapes), joined by assorted whitespace
_WORD = st.one_of(
    st.sampled_from(_STOPWORDS),
    st.text(alphabet="abcdéfXY01_.,;", min_size=1, max_size=6),
)
_WORDS_TEXT = st.lists(_WORD, max_size=40).map(" ".join)

_LANGID_SQL = r"""
WITH w AS (
  SELECT list_transform(list_slice(regexp_extract_all(coalesce(text, ''), '\w+'), 1, 200),
                        x -> lower(x)) AS words
  FROM tt
), h AS (
  SELECT len(words) AS nw,
    len(list_filter(words, x -> x IN ('der','die','und','in','den','von','zu','das','mit','sich','des','auf','ist','im','dem','nicht','ein'))) AS de,
    len(list_filter(words, x -> x IN ('the','and','of','to','a','in','is','it','you','that','was','for','on','are','with','as','i','his','they','be','at'))) AS en,
    len(list_filter(words, x -> x IN ('de','la','que','el','en','y','a','los','se','del','las','un','por','con','no','una','su'))) AS es,
    len(list_filter(words, x -> x IN ('le','de','la','et','les','des','en','un','du','une','que','est','pour','qui','dans','par'))) AS fr
  FROM w
)
SELECT CASE
  WHEN nw = 0 OR greatest(de, en, es, fr) < 2 THEN 'und'
  WHEN de = greatest(de, en, es, fr) THEN 'de'
  WHEN en = greatest(de, en, es, fr) THEN 'en'
  WHEN es = greatest(de, en, es, fr) THEN 'es'
  ELSE 'fr'
END FROM h
"""


@given(_WORDS_TEXT)
@settings(max_examples=300, deadline=None)
def test_detect_language_lockstep_with_duckdb(text):
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE tt(text VARCHAR)")
    con.execute("INSERT INTO tt VALUES (?)", [text])
    want = con.execute(_LANGID_SQL).fetchone()[0]
    con.close()
    assert detect_language(text) == want


_QUALITY_SQL = r"""
WITH f AS (
  SELECT length(text) AS n_chars,
         regexp_extract_all(text, '\w+') AS words,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
  FROM tt
)
SELECT
  CASE WHEN n_chars > 0 THEN n_punct::DOUBLE / n_chars ELSE 0 END,
  CASE WHEN len(words) > 0 THEN len(list_filter(words, x -> lower(x) IN ('the','and','of','to','a','in','is','it','you','that','was','for','on','are','with','as','i','his','they','be','at')))::DOUBLE / len(words) ELSE 0 END,
  CASE WHEN len(words) > 0 THEN list_sum(list_transform(words, x -> length(x)))::DOUBLE / len(words) ELSE 0 END,
  len(words)
FROM f
"""

# quality text mixes words, ASCII + non-ASCII punctuation/whitespace —
# the \w/\s ASCII-vs-Unicode seam the r05 re.ASCII sweep aligned; \x0b
# (vertical tab) pins the RE2-vs-re.ASCII \s gap (RE2 counts it as
# punctuation in [^\w\s] — the r05 finding this fuzzer's first run
# missed because its alphabet had no \v)
_QUALITY_TEXT = st.text(alphabet="the and é ß.,!?#\t\r\n\x0b\xa0abcXY01_", max_size=200)


@given(_QUALITY_TEXT)
@settings(max_examples=300, deadline=None)
def test_quality_features_lockstep_with_duckdb(text):
    """punct/stopword/mean-word-len ratios (and the token count) are
    bit-identical to the oracle SQL: both sides divide exact integer
    tallies, so no float tolerance is needed."""
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE tt(text VARCHAR)")
    con.execute("INSERT INTO tt VALUES (?)", [text])
    punct, stop, mwl, nw = con.execute(_QUALITY_SQL).fetchone()
    con.close()
    f = quality_features(text)
    assert f["punct_ratio"] == punct
    assert f["stopword_ratio"] == stop
    assert f["mean_word_len"] == mwl
    assert token_count(text) == nw
    assert f["n_words"] == float(nw)


# ------------------------------------------- shingles / ngrams / chunks

# the shingle/ngram domains share _norm_ws (explicit ASCII lower +
# ASCII-whitespace collapse); the alphabet hits every seam the engines
# disagree on elsewhere: İ/Ⱟ (case tables), NBSP (Zs non-whitespace
# here), \x0b (RE2 \s excludes it), CR/FF, a combining accent, and
# multi-byte letters that make substr codepoint-vs-byte honest
_SHINGLE_TEXT = st.text(
    alphabet="ab cİⱧK\xa0\t\n\r\x0c\x0b́é_0.", max_size=40
)


@given(_SHINGLE_TEXT)
@settings(max_examples=300, deadline=None)
def test_char_shingles_lockstep_with_duckdb(text):
    """char_shingles == the minhash oracle's shingle CTE (incl. the
    empty-normalized guard and the short-doc whole-text convention)."""
    from coco_search_ray.functions.hashing import char_shingles

    got = sorted(char_shingles(text))
    con = duckdb.connect()
    want = con.execute(
        r"""
        WITH d AS (
          SELECT trim(regexp_replace(translate(coalesce(?, ''),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
                 '\s+', ' ', 'g'), ' ') AS t
        )
        SELECT list_sort(CASE WHEN t = '' THEN []
          ELSE list_distinct([substr(t, i, 5) for i in range(1, greatest(length(t) - 3, 2))])
        END) FROM d
        """,
        [text],
    ).fetchone()[0]
    con.close()
    assert got == want, (repr(text), got, want)


@given(_SHINGLE_TEXT)
@settings(max_examples=300, deadline=None)
def test_word_ngrams_lockstep_with_duckdb(text):
    """word_ngrams == the ngram-jaccard oracle's gram CTE (0 words ->
    empty, 1-2 words -> one whole-text gram, else sliding 3-grams)."""
    from coco_search_ray.functions.hashing import word_ngrams

    got = sorted(word_ngrams(text))
    con = duckdb.connect()
    want = con.execute(
        r"""
        WITH d AS (
          SELECT string_split(trim(regexp_replace(translate(coalesce(?, ''),
                   'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
                 '\s+', ' ', 'g'), ' '), ' ') AS w
        )
        SELECT list_sort(CASE WHEN len(w) = 1 AND w[1] = '' THEN []
          WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
          ELSE list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
        END) FROM d
        """,
        [text],
    ).fetchone()[0]
    con.close()
    assert got == want, (repr(text), got, want)


@given(st.text(alphabet="abé👨́ \n\xa0", max_size=30).map(lambda t: t * 12))
@settings(max_examples=150, deadline=None)
def test_chunk_fixed_lockstep_with_duckdb(text):
    """chunk_documents_fixed's (ord, start, end, text) rows == the
    Q_DOC_CHUNKS_FIXED_SQL substr replay — pins Python slicing and
    DuckDB substr to the same codepoint offsets on multi-byte text."""
    from coco_search_ray.stages.chunking import chunk_documents_fixed

    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([text], pa.string())})
    out = chunk_documents_fixed(batch).to_pylist()
    got = [(r["chunk_ord"], r["start"], r["end"], r["chunk_text"]) for r in out]
    con = duckdb.connect()
    want = [
        (int(r[0]), int(r[1]), int(r[2]), r[3])
        for r in con.execute(
            """
            WITH c AS (SELECT ? AS text, length(?) AS L),
            x AS (SELECT text, L, unnest([s for s in range(0, L, 140)]) AS start FROM c)
            SELECT (start // 140)::BIGINT, start, least(start + 200, L),
                   substr(text, start + 1, least(200, L - start))
            FROM x ORDER BY 1
            """,
            [text, text],
        ).fetchall()
    ]
    con.close()
    assert got == want, (repr(text[:40]), got[:2], want[:2])


# ----------------------------------------------------------- pii scrub

# fragments that compose URL/email near-misses: scheme stubs, TLD-less
# hosts, the URL charset's stop chars, %-encodings, adjacent matches
_PII_FRAG = st.sampled_from([
    "https://a.b/c?d=1", "http://x", "https://", "http:/nope",
    "a@b.co", "a.b@c-d.e.fr", "@x.y", "a@b", "a@b.c", "x%2B@d.io",
    " ", "\n", "\t", ")", "]", "'", '"', "<", ">", "é", "\xa0",
    "a", ".", "-", "_", "%", "+", "@", "1",
])


@given(st.lists(_PII_FRAG, max_size=20).map("".join))
@settings(max_examples=300, deadline=None)
def test_pii_scrub_lockstep_with_duckdb(text):
    """The Arrow replace_substring_regex scrub == the oracle's nested
    regexp_replace 'g' (same RE2 patterns, same URL-then-EMAIL order)."""
    import pyarrow.compute as pc

    from coco_search_ray.pipelines.queries import _PII_EMAIL, _PII_URL

    t = pc.replace_substring_regex(
        pa.array([text], pa.string()), pattern=_PII_URL, replacement="[URL]"
    )
    got = pc.replace_substring_regex(
        t, pattern=_PII_EMAIL, replacement="[EMAIL]"
    )[0].as_py()
    con = duckdb.connect()
    want = con.execute(
        "SELECT regexp_replace(regexp_replace(?, ?, '[URL]', 'g'), ?, '[EMAIL]', 'g')",
        [text, _PII_URL, _PII_EMAIL],
    ).fetchone()[0]
    con.close()
    assert got == want, (repr(text), repr(got), repr(want))


# ------------------------------------------------------- parse QA detail

# delimiter-position arithmetic is replayed in SQL via reverse/strpos
# codepoint math: multi-byte chars before the error delimiter make the
# codepoint-vs-byte contract honest; CRLF exercises the line counter
_QA_TEXT = st.text(alphabet='ab"`()\n\ré👩 \xa0', max_size=30)


@given(st.lists(_QA_TEXT | st.none(), min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_parse_qa_detail_lockstep_with_duckdb(texts):
    """parse_qa_detail's per-row (status, error_pos, error_line) equals
    the Q_PARSE_QA_DETAIL_SQL rule replay row by row."""
    from coco_search_ray.pipelines.stats import parse_qa_detail

    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = parse_qa_detail(batch).to_pylist()
    got = [(r["doc_id"], r["parse_status"], r["error_pos"], r["error_line"]) for r in out]

    con = duckdb.connect()
    con.register("dd", batch)
    want = [
        (int(r[0]), r[1], int(r[2]), int(r[3]))
        for r in con.execute(
            """
            WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM dd), c AS (
              SELECT doc_id, text,
                length(text) - length(replace(text, '"', '')) AS nq,
                length(text) - length(replace(text, chr(96), '')) AS nb,
                length(text) - length(replace(text, '(', '')) AS no,
                length(text) - length(replace(text, ')', '')) AS nc
              FROM d
            ), s AS (
              SELECT *,
                CASE WHEN length(text) = 0 THEN 'empty_text'
                     WHEN nq % 2 = 1 THEN 'unbalanced_quote'
                     WHEN nb % 2 = 1 THEN 'unbalanced_backtick'
                     WHEN no <> nc THEN 'unbalanced_paren'
                     ELSE 'ok' END AS parse_status
              FROM c
            ), e AS (
              SELECT doc_id, parse_status, text,
                CASE WHEN parse_status = 'unbalanced_quote' THEN length(text) - strpos(reverse(text), '"')
                     WHEN parse_status = 'unbalanced_backtick' THEN length(text) - strpos(reverse(text), chr(96))
                     WHEN parse_status = 'unbalanced_paren' AND no > nc THEN length(text) - strpos(reverse(text), '(')
                     WHEN parse_status = 'unbalanced_paren' THEN strpos(text, ')') - 1
                     ELSE -1 END AS error_pos
              FROM s
            )
            SELECT doc_id, parse_status, error_pos,
                   CASE WHEN error_pos >= 0
                        THEN length(substr(text, 1, error_pos))
                             - length(replace(substr(text, 1, error_pos), chr(10), '')) + 1
                        ELSE 0 END AS error_line
            FROM e ORDER BY doc_id
            """
        ).fetchall()
    ]
    con.unregister("dd")
    con.close()
    assert got == want, (texts, got, want)
