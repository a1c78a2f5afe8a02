"""Property-based tests (hypothesis) for the pure kernels — invariants
that must hold on ARBITRARY input, beyond the example-based goldens."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from coco_search_ray.functions.hashing import MinHasher, hash_embedding, jaccard
from coco_search_ray.functions.rrf import rrf_fuse
from coco_search_ray.functions.tokenize import split_code_identifier
from coco_search_ray.stages.canonicalize import union_find
from coco_search_ray.stages.chunking import split_text

_ident = st.text(alphabet=string.ascii_letters + string.digits + "_-", min_size=1, max_size=30)
_text = st.text(
    alphabet=string.ascii_letters + string.digits + " _.\n", min_size=0, max_size=600
)


@given(_ident)
@settings(max_examples=200, deadline=None)
def test_split_identifier_invariants(ident):
    toks = split_code_identifier(ident)
    assert toks[0] == ident  # original always first
    assert all(isinstance(t, str) for t in toks)
    assert toks == split_code_identifier(ident)  # deterministic


@given(_text, st.integers(min_value=20, max_value=200), st.integers(min_value=0, max_value=50))
@settings(max_examples=150, deadline=None)
def test_chunking_invariants(text, size, overlap):
    chunks = split_text(text, chunk_size=size, chunk_overlap=min(overlap, size - 1))
    if not text:
        assert chunks == []
        return
    # offsets reconstruct text exactly
    for c in chunks:
        assert text[c.start : c.end] == c.text
    # full coverage, ordered starts
    assert chunks[0].start == 0
    assert chunks[-1].end == len(text)
    assert all(a.start < b.start for a, b in zip(chunks, chunks[1:]))
    # forward progress + no gaps between consecutive chunks
    for a, b in zip(chunks, chunks[1:]):
        assert b.start <= a.end  # contiguous or overlapping


@given(
    st.lists(st.tuples(st.text(min_size=1, max_size=8), st.floats(0, 1)), max_size=20),
    st.lists(st.tuples(st.text(min_size=1, max_size=8), st.floats(0, 1)), max_size=20),
)
@settings(max_examples=150, deadline=None)
def test_rrf_invariants(vec, kw):
    def dedup_keys(lst):
        seen, out = set(), []
        for k, s in lst:
            if k not in seen:
                seen.add(k)
                out.append((k, s))
        return out

    vec, kw = dedup_keys(vec), dedup_keys(kw)
    fused = rrf_fuse(vec, kw)
    keys = [c.key for c in fused]
    assert len(keys) == len(set(keys))  # unique keys
    assert set(keys) == {k for k, _ in vec} | {k for k, _ in kw}
    scores = [c.fused_score for c in fused]
    assert scores == sorted(scores, reverse=True)  # sorted desc
    assert all(s > 0 for s in scores)
    both = [c for c in fused if c.match_type == "both"]
    for c in both:
        assert c.vector_score is not None and c.keyword_score is not None


@given(
    st.lists(st.sampled_from([f"E{i}" for i in range(12)]), min_size=1, max_size=12, unique=True),
    st.lists(
        st.tuples(
            st.sampled_from([f"E{i}" for i in range(12)]),
            st.sampled_from([f"E{i}" for i in range(12)]),
        ),
        max_size=20,
    ),
)
@settings(max_examples=150, deadline=None)
def test_union_find_invariants(ids, pairs):
    universe = set(ids) | {x for p in pairs for x in p}
    mapping = union_find(sorted(universe), sorted(set(pairs)))
    for node, canon in mapping.items():
        assert mapping[canon] == canon  # idempotent projection
        assert canon <= node  # canonical = min of component
    for a, b in pairs:
        assert mapping[a] == mapping[b]  # connected -> same canonical


@given(st.text(max_size=100))
@settings(max_examples=100, deadline=None)
def test_hash_embedding_invariants(text):
    v = hash_embedding(text)
    assert v.shape == (768,)
    assert float(v.min()) >= -1.0 and float(v.max()) <= 1.0


@given(st.sets(st.text(min_size=1, max_size=6), max_size=40))
@settings(max_examples=100, deadline=None)
def test_minhash_identity(tokens):
    mh = MinHasher(num_perm=32, num_bands=8)
    assert (mh.signature(tokens) == mh.signature(set(tokens))).all()
    assert jaccard(tokens, tokens) == 1.0


# ---------------------------------------------------------------------------
# round-2 kernels: vectorized paths vs readable spec implementations
# ---------------------------------------------------------------------------

_words = st.lists(
    st.text(alphabet=string.ascii_letters + string.digits + "_", min_size=1, max_size=12),
    min_size=0,
    max_size=30,
)


@given(_words)
@settings(max_examples=200, deadline=None)
def test_detect_mentions_single_pass_matches_spec(words):
    """The single-pass detector == the original two-pass spec (bigrams
    with used-in-bigram suppression, then identifiers, sorted by index,
    deduped keep-first)."""
    import re

    from coco_search_ray.functions.mentions import (
        _CAP_WORD_RE,
        _is_identifier_mention,
        detect_mentions,
    )

    text = " ".join(words)
    got = detect_mentions(text)

    # spec re-implementation (the pre-optimization shape)
    wlist = re.findall(r"[A-Za-z0-9_]+", text)
    caps = [_CAP_WORD_RE.match(w) is not None for w in wlist]
    found, used = [], set()
    for i in range(len(wlist) - 1):
        if caps[i] and caps[i + 1]:
            found.append((i, f"{wlist[i]} {wlist[i + 1]}"))
            used.add(i)
            used.add(i + 1)
    for i, w in enumerate(wlist):
        if i not in used and _is_identifier_mention(w):
            found.append((i, w))
    found.sort(key=lambda t: t[0])
    expect, seen = [], set()
    for _, s in found:
        if s not in seen:
            seen.add(s)
            expect.append(s)
    assert got == expect


_turn_text = st.text(
    alphabet=string.ascii_letters + string.digits + " _.-ünïé\n", min_size=0, max_size=120
)


@given(st.lists(st.one_of(st.none(), _turn_text), min_size=0, max_size=12))
@settings(max_examples=200, deadline=None)
def test_detect_mentions_batch_matches_per_turn(texts):
    """The vectorized whole-batch kernel == mapping the per-turn spec
    function over the batch (counts AND flat first-occurrence-ordered
    surfaces)."""
    from coco_search_ray.functions.mentions import detect_mentions, detect_mentions_batch

    counts, flat = detect_mentions_batch(texts)
    expect_per = [detect_mentions(t) if t else [] for t in texts]
    assert list(counts) == [len(m) for m in expect_per]
    assert flat.to_pylist() == [s for m in expect_per for s in m]


def test_extract_mention_rows_batch_path_equals_fallback():
    """extract_mention_rows with the BATCH fast path produces the exact
    table the scalar fallback does (sorted-row equality, all columns)."""
    import pyarrow as pa

    from coco_search_ray.stages import extract as ex

    rows = [
        ("c1", 0, "user", "call get_user_by_id on Payment Service now", "bash"),
        ("c1", 1, "assistant", "Payment Service Gateway then snake_case x", ""),
        ("c1", 2, "tool", None, "t"),
        ("c2", 0, "user", "", ""),
        ("c2", 1, "user", 'see "quoted lit" and http://x.io v1.2.3', "web"),
        ("c3", 0, "user", "CamelCase CamelCase repeat Repeat Repeat", ""),
    ]
    batch = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    snap = ex._get_snapshot()
    assert snap.entity_batch is not None  # default plan: single entity family
    fast = ex.extract_mention_rows(batch)
    saved = snap.entity_batch
    try:
        snap.entity_batch = None
        slow = ex.extract_mention_rows(batch)
    finally:
        snap.entity_batch = saved
    key = ["conv_id", "turn_idx", "mention_ord", "kind_code"]
    f = fast.to_pandas().sort_values(key).reset_index(drop=True)
    s = slow.to_pandas().sort_values(key).reset_index(drop=True)
    assert f.equals(s)
    assert fast.num_rows > 0


@given(_text)
@settings(max_examples=200, deadline=None)
def test_shingle_hash_sets_match_string_sets(text):
    """Hashed-shingle cardinalities and Jaccard == string-set versions
    (equal up to 2^-64 collisions, which hypothesis will never hit)."""
    from coco_search_ray.functions.hashing import (
        char_shingle_hashes,
        char_shingles,
        jaccard,
        jaccard_u64,
        word_ngram_hashes,
        word_ngrams,
    )

    assert len(char_shingle_hashes(text, 5)) == len(char_shingles(text, 5))
    assert len(word_ngram_hashes(text, 3)) == len(word_ngrams(text, 3))
    other = text[::-1]
    a, b = char_shingle_hashes(text, 5), char_shingle_hashes(other, 5)
    assert abs(jaccard_u64(a, b) - jaccard(char_shingles(text, 5), char_shingles(other, 5))) < 1e-12


@given(st.lists(_text, min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_minhash_batch_independent_of_batching(texts):
    """signatures_batch rows depend only on the doc, not on which other
    docs share the batch (reduceat boundary correctness)."""
    import numpy as np

    from coco_search_ray.functions.hashing import MinHasher, char_shingle_hashes

    h = MinHasher(num_perm=32, num_bands=8)
    arrays = [char_shingle_hashes(t, 5) for t in texts]
    batched = h.signatures_batch(arrays)
    for i, arr in enumerate(arrays):
        single = h.signatures_batch([arr])
        assert np.array_equal(batched[i], single[0])
    bands = h.band_hashes(batched)
    assert bands.shape == (len(texts), 8)


@given(st.lists(st.text(alphabet=string.ascii_lowercase + " ", min_size=0, max_size=40), min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_simhash_vectorized_matches_spec(tokens):
    """Vectorized simhash64 == the per-token bit-count spec."""
    from coco_search_ray.functions.hashing import simhash64, stable_hash64

    got = simhash64(tokens)
    acc = [0] * 64
    for t in tokens:
        hv = stable_hash64(t)
        for i in range(64):
            acc[i] += 1 if (hv >> i) & 1 else -1
    expect = 0
    for i in range(64):
        if acc[i] > 0:
            expect |= 1 << i
    assert got == expect


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), st.integers(min_value=0, max_value=6))
@settings(max_examples=300, deadline=None)
def test_round_half_away_matches_decimal(x, dec):
    """round_half_away == decimal ROUND_HALF_UP on the float's exact
    binary value (the DuckDB-compatible mode)."""
    import decimal

    from coco_search_ray.functions.numeric import round_half_away

    got = round_half_away(x, dec)
    d = decimal.Decimal(x).quantize(decimal.Decimal(1).scaleb(-dec), rounding=decimal.ROUND_HALF_UP)
    assert abs(got - float(d)) < 1e-9 * max(1.0, abs(x))


_MD_ALPHABET = st.text(
    alphabet="[]()#!: \t\nabcrepoURL/.-@_chart" + "\"'",
    max_size=300,
)


@given(_MD_ALPHABET)
@settings(max_examples=300, deadline=None)
def test_new_extractors_total_and_deterministic(text):
    """argocd / md_refs / md_links never raise on adversarial bracket/
    key soup, are deterministic, and every emitted surface is non-empty
    with no leading/trailing whitespace (delimiters never leak)."""
    from coco_search_ray.extractors import argocd, md_links, md_refs

    for mod in (argocd, md_links, md_refs):
        out = mod.extract(text)
        assert out == mod.extract(text)
        assert len(out) == len(set(out))
        for s in out:
            assert s
            # wiki refs ([[ x ]]) keep interior spacing verbatim; the
            # whitespace-free char classes make the others strip-clean
            if mod is not md_links:
                assert s == s.strip()


@given(_MD_ALPHABET)
@settings(max_examples=300, deadline=None)
def test_md_refs_targets_come_from_definitions(text):
    """Every md_refs surface is a cleaned definition target from the
    same text (resolution never invents strings)."""
    import re

    from coco_search_ray.extractors import md_refs
    from coco_search_ray.extractors.md_links import clean_target

    defs = {
        clean_target(m.group(2))
        for m in re.finditer(
            r"^[ \t]*\[([^\]\n]{1,80})\]:[ \t]*([^ \t\r\n]{1,200})",
            text,
            re.MULTILINE,
        )
    }
    for s in md_refs.extract(text):
        assert s in defs


_YAML_ALPHABET = st.text(
    alphabet="depnds_o:xtcvfil-abq \t\n'\"`/.#0",
    max_size=300,
)


@given(_YAML_ALPHABET)
@settings(max_examples=300, deadline=None)
def test_yaml_block_extractors_total_and_deterministic(text):
    """compose_deps / md_frontmatter / md_code_paths never raise on
    adversarial yaml-ish soup, are deterministic, and every emitted
    surface is non-empty with no leading/trailing space/newline.

    md_code_paths may legitimately carry TABS: the reference's
    _looks_like_path (markdown.py:126) rejects only the literal space
    character, so a code span like `/\\t` is a path by reference
    semantics and the oracle's mcp CTE replays the same rule — the
    invariant here must not be stricter than the parity contract."""
    from coco_search_ray.extractors import compose_deps, md_code_paths, md_frontmatter

    for mod in (compose_deps, md_frontmatter, md_code_paths):
        out = mod.extract(text)
        assert out == mod.extract(text)
        assert len(out) == len(set(out))
        for s in out:
            assert s and s == s.strip(" \r\n")
            if mod is not md_code_paths:
                assert s == s.strip()


@given(_YAML_ALPHABET)
@settings(max_examples=200, deadline=None)
def test_compose_deps_surfaces_are_service_shaped(text):
    """Every compose_deps surface matches the service-name class (the
    capture groups never leak delimiters, indentation or values)."""
    import re

    from coco_search_ray.extractors import compose_deps

    svc = re.compile(r"^[A-Za-z0-9._-]+$")
    for s in compose_deps.extract(text):
        assert svc.match(s)


_GO_ALPHABET = st.text(
    alphabet='import"()_. \t\nfmtoslgexbc/',
    max_size=300,
)


@given(_GO_ALPHABET)
@settings(max_examples=300, deadline=None)
def test_go_imports_total_deterministic_and_lockstep(text):
    """go_imports never raises on adversarial go-ish soup, is
    deterministic, dedupes, emits quote-/newline-free packages — and
    the DuckDB replay (the Q_GO_IMPORTS_SQL rule pair) agrees on the
    SET of packages for every input (counting is order-insensitive)."""
    import duckdb

    from coco_search_ray.extractors import go_imports

    out = go_imports.extract(text)
    assert out == go_imports.extract(text)
    assert len(out) == len(set(out))
    for s in out:
        assert s and '"' not in s and "\n" not in s
    sql = r"""
    SELECT list_distinct(
      regexp_extract_all(t, '\bimport[ \t]+(?:[A-Za-z_.][A-Za-z0-9_]*[ \t]+)?"([^"\n]+)"', 1)
      || flatten(list_transform(
           regexp_extract_all(t, '\bimport[ \t]*\(([^)]*)\)', 1),
           b -> regexp_extract_all(b, '(?m)(?:^|;)[ \t]*(?:[A-Za-z_.][A-Za-z0-9_]*[ \t]+)?"([^"\n]+)"', 1)
         ))
    ) FROM (SELECT ? AS t)
    """
    duck = duckdb.execute(sql, [text]).fetchone()[0]
    assert sorted(out) == sorted(duck)


def test_extractor_regexes_are_ascii_like_re2():
    """Round-5 review finding: every extractor regex is compiled
    re.ASCII so \\b/\\s/\\w agree with the RE2/DuckDB replays. Pinned on
    the two verified repro shapes: a NBSP inside a URL is NOT \\s (one
    URL, not two) and a non-ASCII letter before a keyword IS an ASCII
    \\b (the import extracts). Both asserted against DuckDB directly."""
    import duckdb
    import re as _re

    from coco_search_ray import extractors as ex
    from coco_search_ray.extractors import imports, urls

    t1 = "https://a.com/x\xa0https://a.com/y"
    duck1 = duckdb.execute(
        "SELECT regexp_extract_all(?, 'https?://[^\\s\"''<>\\)\\]]+')", [t1]
    ).fetchone()[0]
    assert urls.extract(t1) == duck1 == [t1]

    t2 = "éimport pkg.mod"
    duck2 = duckdb.execute(
        r"SELECT regexp_extract_all(?, '\bimport[ \t\r\n]+([A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z0-9_]+)+)', 1)",
        [t2],
    ).fetchone()[0]
    assert imports.extract(t2) == duck2 == ["pkg.mod"]

    # structural pin: every compiled pattern that uses a
    # charset-sensitive metachar (\b \s \w \d and negations) carries
    # the ASCII flag (explicit-class-only patterns don't need it)
    sensitive = _re.compile(r"\\[bBsSwWdD]")
    for mod in ex.REGISTRY.values():
        for v in vars(mod).values():
            if isinstance(v, _re.Pattern) and sensitive.search(v.pattern):
                assert v.flags & _re.ASCII, f"{mod.NAME}: {v.pattern!r}"


def test_shingle_normalization_is_ascii_ws():
    """Shingle/ngram normalization collapses ASCII whitespace ONLY,
    byte-identical to the oracles' trim(regexp_replace(lower(text),
    '\\s+', ' ', 'g'), ' ') under RE2 (explicit trim SET: DuckDB's
    default trim also strips NBSP) — Python str.split() would also eat
    NBSP/U+2028 and change shingle sets on non-ASCII text."""
    import duckdb

    from coco_search_ray.functions.hashing import _norm_ws, char_shingles

    # İstanbul pins the ASCII-lower contract: Python str.lower('İ') is
    # 'i'+combining-dot while DuckDB lower() gives 'i' — so BOTH engines
    # use an explicit 26-char translate instead (round-5 finding)
    for t in ["A \t B", "aaaaa\xa0bbbbb", "x y", "  pad  ", "", "\xa0",
              "İstanbul PAYMENT", "Ⱟx Y"]:
        duck = duckdb.execute(
            r"SELECT trim(regexp_replace(translate(?,"
            r" 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),"
            r" '\s+', ' ', 'g'), ' ')", [t]
        ).fetchone()[0]
        assert _norm_ws(t) == duck, repr(t)
    assert char_shingles("aaaaa\xa0bbbbb") != char_shingles("aaaaa bbbbb")


_MIXED_ALPHABET = st.text(
    # ASCII family material + the charset-sensitive shapes: NBSP,
    # accented letters, CR/LF — the inputs where Unicode-vs-ASCII
    # regex semantics would diverge between the engines
    # \x0b (vertical tab) pins the RE2-vs-re.ASCII \s seam: RE2 \s
    # excludes it, Python ASCII \s includes it (round-5 urls finding)
    alphabet='abcdefXYZ0123._-@/:()"\'`\t\r\n\x0b v\xa0é\u2028',
    max_size=200,
)


@given(_MIXED_ALPHABET)
@settings(max_examples=300, deadline=None)
def test_classic_families_lockstep_with_duckdb(text):
    """The five classic literal families (quoted / urls / emails /
    paths / versions) and the imports family agree with their exact
    DuckDB replay rules (the kg_literal_mentions CTEs) on the SET of
    surfaces for every input INCLUDING non-ASCII whitespace and
    letters — the round-5 re.ASCII alignment under fuzz. (The text is
    bound through a temp table: '?' placeholders collide with the
    '(?:' group syntax inside the regex literals.)"""
    import duckdb

    from coco_search_ray.extractors import emails, imports, paths, quoted, urls, versions

    rules = {
        quoted: (
            "list_distinct(list_transform("
            "regexp_extract_all(text, '\"[^\"\\n]{2,60}\"|`[^`\\n]{1,60}`'),"
            " x -> x[2:-2]))"
        ),
        urls: "list_distinct(regexp_extract_all(text, 'https?://[^\\s\"''<>\\)\\]]+'))",
        emails: (
            "list_distinct(regexp_extract_all(text,"
            " '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))"
        ),
        paths: (
            "list_distinct(regexp_extract_all(text,"
            " '(?:^|[\\s(''\"`])(/(?:[A-Za-z0-9._-]+/)+[A-Za-z0-9_-]+\\.[A-Za-z0-9]{1,8})', 1))"
        ),
        versions: (
            "list_distinct(regexp_extract_all(text,"
            " '\\bv?[0-9]+\\.[0-9]+\\.[0-9]+(?:-[0-9A-Za-z.]+)?\\b'))"
        ),
        imports: (
            "list_distinct("
            "regexp_extract_all(text, '\\bfrom[ \\t\\r\\n]+((?:\\.{1,3})?[A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z0-9_]+)*)[ \\t\\r\\n]+import[ \\t\\r\\n]', 1)"
            " || regexp_extract_all(text, '\\bimport[ \\t\\r\\n]+([A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z0-9_]+)+)', 1)"
            " || regexp_extract_all(text, 'require\\([ \\t\\r\\n]*[''\"]([^''\"]+)[''\"][ \\t\\r\\n]*\\)', 1)"
            " || regexp_extract_all(text, '\\bimport[ \\t\\r\\n]+[A-Za-z0-9_{}, *\\t\\r\\n]+[ \\t\\r\\n]*from[ \\t\\r\\n]+[''\"]([^''\"]+)[''\"]', 1)"
            " || regexp_extract_all(text, '(?:^|[\\r\\n;])[ \\t]*import[ \\t\\r\\n]+([A-Za-z_][A-Za-z0-9_]*(?:\\.[A-Za-z0-9_]+)*)[ \\t\\r\\n]+as[ \\t\\r\\n]', 1))"
        ),
    }
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE tt(text VARCHAR)")
    con.execute("INSERT INTO tt VALUES (?)", [text])
    for mod, expr in rules.items():
        duck = con.execute(f"SELECT {expr} FROM tt").fetchone()[0]
        got = mod.extract(text)
        assert sorted(set(got)) == sorted(set(duck)), mod.NAME
    con.close()


_YAML_CI_ALPHABET = st.text(
    alphabet='abcdefXYZ0123._-@/:"\'`\t\r\n {}()#éincludesteprov\xa0',
    max_size=250,
)


@given(_YAML_CI_ALPHABET)
@settings(max_examples=300, deadline=None)
def test_yaml_ci_families_lockstep_with_duckdb(text):
    """The yaml/CI families (images, ci_uses, gitlab_ci, ci_extends,
    helm_tpl, argocd) agree with their exact kg_literal_mentions CTE
    rules on the SET of surfaces under a mixed-charset alphabet — same
    lockstep harness as the classic families."""
    import duckdb

    from coco_search_ray.extractors import argocd, ci_extends, ci_uses, gitlab_ci, helm_tpl, images

    img = (
        "'\\bimage:[ \\t]*([a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)*"
        ":[A-Za-z0-9_][A-Za-z0-9._-]*|[a-z0-9]+(?:[._-][a-z0-9]+)*(?:/[a-z0-9]+(?:[._-][a-z0-9]+)*)+)'"
    )
    frm = img.replace("\\bimage:[ \\t]*", "\\bFROM[ \\t]+")
    rules = {
        images: f"list_distinct(regexp_extract_all(text, {img}, 1) || regexp_extract_all(text, {frm}, 1))",
        ci_uses: (
            "list_distinct("
            "regexp_extract_all(text, '\\buses:[ \\t]*[''\"]?([A-Za-z0-9_][A-Za-z0-9_.-]*(?:/[A-Za-z0-9_.-]+)+@[A-Za-z0-9._/-]+)', 1)"
            " || regexp_extract_all(text, '\\buses:[ \\t]*[''\"]?(\\./[A-Za-z0-9._/-]+)', 1))"
        ),
        gitlab_ci: (
            "list_distinct("
            "regexp_extract_all(text, '\\binclude:[ \\t]*[''\"]?([A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)"
            " || regexp_extract_all(text, '\\blocal:[ \\t]*[''\"]?(/?[A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1)"
            " || regexp_extract_all(text, '\\btemplate:[ \\t]*[''\"]?([A-Za-z0-9_][A-Za-z0-9_./-]*\\.ya?ml)', 1))"
        ),
        ci_extends: "list_distinct(regexp_extract_all(text, '\\bextends:[ \\t]*[''\"]?(\\.[A-Za-z0-9_-]+)', 1))",
        helm_tpl: (
            "list_distinct("
            "regexp_extract_all(text, '\\{\\{-?[ \\t]*include[ \\t]+\"([^\"\\n]+)\"', 1)"
            " || regexp_extract_all(text, '\\{\\{-?[ \\t]*template[ \\t]+\"([^\"\\n]+)\"', 1))"
        ),
        argocd: (
            "list_distinct("
            "regexp_extract_all(text, '\\brepoURL:[ \\t]*[''\"]?([A-Za-z][A-Za-z0-9+.-]*://[A-Za-z0-9._~:/@-]+|git@[A-Za-z0-9._-]+:[A-Za-z0-9._/-]+)', 1)"
            " || regexp_extract_all(text, '\\bchart:[ \\t]*[''\"]?([A-Za-z0-9][A-Za-z0-9._-]*)', 1)"
            " || regexp_extract_all(text, '\\bpath:[ \\t]*[''\"]?([A-Za-z0-9._-]+(?:/[A-Za-z0-9._-]+)*)', 1)"
            " || regexp_extract_all(text, '\\bproject:[ \\t]*[''\"]?([A-Za-z0-9][A-Za-z0-9._-]*)', 1))"
        ),
    }
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE tt(text VARCHAR)")
    con.execute("INSERT INTO tt VALUES (?)", [text])
    for mod, expr in rules.items():
        duck = con.execute(f"SELECT {expr} FROM tt").fetchone()[0]
        got = mod.extract(text)
        assert sorted(set(got)) == sorted(set(duck)), mod.NAME
    con.close()


# Fragment-based text: structured shapes (multi-line yaml blocks,
# reference-link definition tables, code spans) never emerge from a
# plain char alphabet, so these strategies concatenate adversarial
# FRAGMENTS — valid forms, truncated forms, case twists, CRLF, unicode
# — and let hypothesis shuffle them into inputs where the two engines
# could disagree.
_MD_FRAGMENTS = st.lists(
    st.sampled_from(
        [
            "[a](docs/x.md)", "[b](https://e.x/p)", "[c](mailto:a@b)",
            "[d](#only)", "[e](y#frag)", "[f](", "](z)", "[[wiki.page]]",
            "[[https://w]]", "[[", "]]", "[label][r1]", "[r1][]", "[x][R1]",
            "[r1]: docs/a.md\n", "[R1]: other/b.md#frag\n",
            "  [r2]: https://e.x/\n", "[x][r2]", "[r3]: dir/\n", "[y][r3]",
            "[r1]: second/def.md\n", "[missing][nodef]", "#anchor",
            "`src/cli.py`", "`not a path`", "`a.py`", "`x.exe`", "`dir/sub/`",
            "`-flag/x.py`", "`a;b/c.py`", "``", "`",
            "# src/util/io.py and lib/a.js\n", "// pkg/mod.go\n",
            "-- db/schema.sql\n", "#dir/noext\n", "  // a/b.unknownext\n",
            "depends:\n  - docs/a.md\n  - lib/\n", "depends:\n", "depends: x\n",
            "  - stray\n", "depends:\n\t- tabbed.md \n", "- ", "]:", "][",
            "\n", "\r\n", " ", "\t", "x", "é", "\xa0", ".", "/", ":",
            # İ pins the ASCII-lower contract: str.lower('İ') is
            # 'i'+combining-dot while DuckDB lower() is 'i' — both
            # sides now use an explicit translate (round-5 finding)
            "[İref][]", "[İref]: tr/i.md\n", "[i̇ref]: tr/j.md\n",
        ]
    ),
    max_size=25,
).map("".join)


@given(_MD_FRAGMENTS)
@settings(max_examples=250, deadline=None)
def test_md_families_lockstep_with_duckdb(text):
    """The four markdown families (md_links, md_refs, md_code_paths,
    md_frontmatter) agree with their exact kg_literal_mentions CTE
    replays on the SET of surfaces — including the md_refs two-pass
    definition-table resolution (keep-first per case-folded ref ==
    list_position on the lowered def list) and the md_code_paths
    _looks_like_path / known-extension gates."""
    import duckdb

    from coco_search_ray.extractors import md_code_paths, md_frontmatter, md_links, md_refs
    from coco_search_ray.extractors.md_code_paths import PATH_EXTENSIONS

    exts = ", ".join(f"'{e}'" for e in sorted(PATH_EXTENSIONS))
    rules = {
        md_links: (
            "SELECT list_distinct("
            " list_filter(list_transform(list_filter("
            "   regexp_extract_all(text, '\\[[^\\]\\n]{1,80}\\]\\(([^()\\[\\] \\t\\r\\n]{1,200})\\)', 1),"
            "   x -> NOT regexp_matches(x, '^(https?://|mailto:|#)')),"
            "  x -> regexp_replace(x, '#.*', '')), x -> x != '')"
            " || list_filter("
            "   regexp_extract_all(text, '\\[\\[([^\\[\\]\\n]{1,80})\\]\\]', 1),"
            "   x -> NOT regexp_matches(x, '^https?://'))) FROM tt"
        ),
        md_refs: (
            "SELECT list_distinct(list_filter(list_transform(list_filter("
            "  list_transform("
            "    regexp_extract_all(text, '\\[[^\\]\\n]{1,80}\\]\\[([^\\]\\n]{1,80})\\]', 1)"
            "    || regexp_extract_all(text, '\\[([^\\]\\n]{1,80})\\]\\[\\]', 1),"
            "    r -> dtgts[list_position(drefs, translate(r, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'))]"
            "  ), x -> x IS NOT NULL AND NOT regexp_matches(x, '^(https?://|mailto:|#)')),"
            "  x -> regexp_replace(x, '#.*', '')), x -> x != ''))"
            " FROM (SELECT text,"
            "  list_transform(regexp_extract_all(text,"
            "   '(?m)^[ \\t]*\\[([^\\]\\n]{1,80})\\]:[ \\t]*([^ \\t\\r\\n]{1,200})', 1), x -> translate(x, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')) AS drefs,"
            "  regexp_extract_all(text,"
            "   '(?m)^[ \\t]*\\[([^\\]\\n]{1,80})\\]:[ \\t]*([^ \\t\\r\\n]{1,200})', 2) AS dtgts"
            " FROM tt)"
        ),
        md_code_paths: (
            "SELECT list_distinct("
            " list_filter("
            "  regexp_extract_all(text, '`([^`\\n]{1,200})`', 1),"
            "  x -> NOT regexp_matches(x, '[()=+{}\\[\\];|<> ]') AND x NOT LIKE '-%'"
            f"      AND (contains(x, '/') OR (contains(x, '.')"
            f"           AND translate(regexp_extract(x, '\\.([^.]*)$', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ({exts}))))"
            " || list_filter("
            "  flatten(list_transform("
            "   regexp_extract_all(text, '(?m)^[ \\t]*(?:#|//|--)([^\\n]*)', 1),"
            "   l -> regexp_extract_all(l, '(?:[A-Za-z0-9_.~-]+/)+[A-Za-z0-9_.-]+'))),"
            "  x -> NOT regexp_matches(x, '\\.[^/]*$')"
            f"      OR translate(regexp_extract(x, '\\.([^.]*)$', 1), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz') IN ({exts}))) FROM tt"
        ),
        md_frontmatter: (
            "SELECT list_distinct(flatten(list_transform("
            " regexp_extract_all(text, '(?m)^depends:[ \\t]*\\n((?:[ \\t]+-[ \\t]+[^\\n]+\\n?)+)', 1),"
            " b -> regexp_extract_all(b, '-[ \\t]+([^\\n]*[^ \\t\\r\\n])', 1)))) FROM tt"
        ),
    }
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE tt(text VARCHAR)")
    con.execute("INSERT INTO tt VALUES (?)", [text])
    for mod, sql in rules.items():
        duck = con.execute(sql).fetchone()[0]
        got = mod.extract(text)
        assert sorted(set(got)) == sorted(set(duck)), mod.NAME
    con.close()


_YAML_CODE_FRAGMENTS = st.lists(
    st.sampled_from(
        [
            "depends_on:\n  - redis\n  - 'db'\n", "depends_on:\n  - \"q\"\n",
            "depends_on:\n  web:\n    condition: service_healthy\n",
            "depends_on:\n  a:\n    condition: x\n  b:\n    condition: y\n",
            "depends_on: [inline]\n", "depends_on:\n", "  - svc\n",
            "extends:\n  file: base.yml\n  service: core\n",
            "extends:\n  service: edge\n", "extends: .tpl\n", "service: solo\n",
            "  condition: started\n",
            'resource "aws_s3_bucket" "logs" {', 'data "tf_state" "main"',
            'resource "Short" "x"', 'resource "serviceGate" "y"',
            'resource "LongPascalName" "z"', 'resource "nounderscore" "w"',
            'data  "a_b" "c-d"', 'resource "a_b"', '"x_y" "z"',
            "def f(x):", "def  g (", "class Big(Base):", "class tiny:",
            "class C {", "function go(", "func main(", "func (s *Server) Run(",
            "func (s Server) Stop(", "fn new<", "fn run(", "struct Point {",
            "struct X{", "structX {", "defx(", "the class size: big",
            "\n", "\r\n", " ", "\t", "x", "é", "\xa0", '"', "'", "-", ":", "(",
        ]
    ),
    max_size=25,
).map("".join)


@given(_YAML_CODE_FRAGMENTS)
@settings(max_examples=250, deadline=None)
def test_compose_hcl_symbols_lockstep_with_duckdb(text):
    """compose_deps, hcl_blocks and the symbols literal family agree
    with their exact CTE replays (kg_literal_mentions cd/sym,
    q_hcl_resources incl. the identifier-shape root gate) on the SET of
    surfaces under adversarial block nesting."""
    import duckdb

    from coco_search_ray.extractors import compose_deps, hcl_blocks, symbols

    _hcl_rx = (
        '\\b{kw}[ \\t]+"[A-Za-z_][A-Za-z0-9_]*"[ \\t]+"[A-Za-z_][A-Za-z0-9_-]*"'
    )
    _hcl_anch = (
        '^{kw}[ \\t]+\"([A-Za-z_][A-Za-z0-9_]*)\"[ \\t]+\"([A-Za-z_][A-Za-z0-9_-]*)\"$'
    )
    _gate = (
        "regexp_matches(split_part(x, '.', 1), '[a-zA-Z0-9]+_[a-zA-Z0-9]+')"
        " OR (length(split_part(x, '.', 1)) >= 6"
        "     AND regexp_matches(substr(split_part(x, '.', 1), 1, 1), '[a-z]')"
        "     AND regexp_matches(split_part(x, '.', 1), '[a-z][A-Z]'))"
        " OR (length(split_part(x, '.', 1)) >= 8"
        "     AND regexp_matches(split_part(x, '.', 1), '[A-Z][a-z]+[A-Z]'))"
    )
    rules = {
        compose_deps: (
            "SELECT list_distinct("
            " flatten(list_transform("
            "  regexp_extract_all(text, '\\bdepends_on:[ \\t]*\\n((?:[ \\t]+-[ \\t]+[^\\n]+\\n?)+)', 1),"
            "  b -> regexp_extract_all(b, '-[ \\t]+[''\"]?([A-Za-z0-9._-]+)', 1)))"
            " || flatten(list_transform("
            "  regexp_extract_all(text, '\\bdepends_on:[ \\t]*\\n((?:[ \\t]+[A-Za-z0-9._-]+:[ \\t]*\\n[ \\t]+condition:[^\\n]+\\n?)+)', 1),"
            "  b -> regexp_extract_all(b, '([A-Za-z0-9._-]+):[ \\t]*\\n', 1)))"
            " || regexp_extract_all(text, '\\bextends:[ \\t]*\\n(?:[ \\t]+file:[^\\n]*\\n)?[ \\t]+service:[ \\t]*[''\"]?([A-Za-z0-9._-]+)', 1)"
            ") FROM tt"
        ),
        hcl_blocks: (
            "SELECT list_filter(list_distinct("
            " list_transform(regexp_extract_all(text, '" + _hcl_rx.format(kw="resource") + "'),"
            "  x -> regexp_replace(x, '" + _hcl_anch.format(kw="resource") + "', '\\1.\\2'))"
            " || list_transform(regexp_extract_all(text, '" + _hcl_rx.format(kw="data") + "'),"
            "  x -> regexp_replace(x, '" + _hcl_anch.format(kw="data") + "', '\\1.\\2'))"
            "), x -> " + _gate + ") FROM tt"
        ),
        symbols: (
            "SELECT list_distinct("
            " regexp_extract_all(text, '\\bdef[ \\t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1)"
            " || regexp_extract_all(text, '\\bclass[ \\t]+([A-Za-z_][A-Za-z0-9_]*)[ \\t]*[:({]', 1)"
            " || regexp_extract_all(text, '\\bfunction[ \\t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1)"
            " || regexp_extract_all(text, '\\bfunc[ \\t]+([A-Za-z_][A-Za-z0-9_]*)\\(', 1)"
            " || list_transform("
            "      regexp_extract_all(text, '\\bfunc[ \\t]+\\([A-Za-z_][A-Za-z0-9_]*[ \\t]+\\*?[A-Za-z_][A-Za-z0-9_]*\\)[ \\t]+[A-Za-z_][A-Za-z0-9_]*\\('),"
            "      x -> regexp_replace(x, '^\\bfunc[ \\t]+\\([A-Za-z_][A-Za-z0-9_]*[ \\t]+\\*?([A-Za-z_][A-Za-z0-9_]*)\\)[ \\t]+([A-Za-z_][A-Za-z0-9_]*)\\($', '\\1.\\2'))"
            " || regexp_extract_all(text, '\\bfn[ \\t]+([A-Za-z_][A-Za-z0-9_]*)[(<]', 1)"
            " || regexp_extract_all(text, '\\bstruct[ \\t]+([A-Za-z_][A-Za-z0-9_]*)[ \\t]*\\{', 1)"
            ") FROM tt"
        ),
    }
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE tt(text VARCHAR)")
    con.execute("INSERT INTO tt VALUES (?)", [text])
    for mod, sql in rules.items():
        duck = con.execute(sql).fetchone()[0]
        got = mod.extract(text)
        assert sorted(set(got)) == sorted(set(duck)), mod.NAME
    con.close()


_GLOB_CHARS = st.text(alphabet="aB#. %_*?\\", min_size=0, max_size=12)
_GLOB_ROWS = st.lists(
    st.one_of(st.none(), st.text(alphabet="aAbB#. %_?*\\", min_size=0, max_size=12)),
    min_size=0,
    max_size=10,
)


@given(_GLOB_CHARS, _GLOB_ROWS)
@settings(max_examples=200, deadline=None)
def test_glob_filter_matches_duckdb_ilike_escape(glob, rows):
    """Lockstep fuzz for the glob operator's cross-engine escape seam:
    filter_glob (Arrow match_like, backslash = default escape, the
    Postgres/reference semantics) must keep exactly the rows DuckDB's
    ``ILIKE pattern ESCAPE '\\'`` keeps — DuckDB LIKE has NO default
    escape char, which is why Q_GLOB_FILTER_SQL spells the clause.
    Covers literal %/_ in the glob (escaped by glob_to_like), embedded
    backslashes (pass through raw, act as escapes on both engines),
    NULL rows (dropped on both sides) and ASCII case folding."""
    import duckdb
    import pyarrow as pa
    from hypothesis import assume

    from coco_search_ray.functions.globs import filter_glob, glob_to_like

    like = glob_to_like(glob)
    # a dangling trailing escape is a documented caller-owned edge:
    # Postgres and DuckDB raise, Arrow reads it as a literal (globs.py)
    assume(not (len(like) - len(like.rstrip("\\"))) % 2)
    batch = pa.table({"s": pa.array(rows, pa.string())})
    got = filter_glob(batch, "s", glob)["s"].to_pylist()
    con = duckdb.connect()
    con.register("tt", batch)
    duck = [
        r[0]
        for r in con.execute(
            "SELECT s FROM tt WHERE s ILIKE ? ESCAPE '\\'", [like]
        ).fetchall()
    ]
    con.close()
    assert got == duck, (glob, like)


def test_float_average_boundary_margins():
    """Gate-tier pin for the non-integerizable float-average contracts
    (avg of logprobs / ratios / norms / chars — money sums moved to the
    exact-cents contract instead, see functions/numeric.py): the hash
    gate is deterministic only while each unrounded average sits far
    from its rounding boundary relative to the cross-engine accumulation
    drift (~n_group * eps * |mean|, the n-term summation bound). This
    caught avg_logprob at 4dp sitting 5.07e-9 from a boundary — ~1 sigma
    of the drift, a coin flip — and pinned the move to 3dp (margin
    8.4e-5). Pure DuckDB re-derivation of the oracles' unrounded values;
    no Ray needed."""
    import os

    import duckdb
    import numpy as np
    import pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver test tables not present")
    from coco_search_ray.pipelines import queries as q

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    eps = np.finfo(np.float64).eps

    def margin(vals, dec):
        x = np.abs(np.asarray(vals, dtype=np.float64)) * 10.0**dec
        return float(np.min(np.abs(x - np.floor(x) - 0.5))) * 10.0**-dec

    checks = [
        # (name, unrounded SQL, [(col, dec)])
        (
            "q_doc_unigram_lm",
            q.Q_DOC_UNIGRAM_LM_SQL.replace("round(avg(lp), 3)", "avg(lp)").replace(
                "round(avg(lp / nt), 4)", "avg(lp / nt)"
            ),
            [("avg_logprob", 3), ("avg_logprob_per_token", 4)],
        ),
        (
            "q_doc_stats",
            q.Q_DOC_STATS_SQL.replace("round(avg(n_chars), 2)", "avg(n_chars)"),
            [("avg_chars", 2)],
        ),
        (
            "q_doc_quality",
            q.Q_DOC_QUALITY_SQL.replace("round(avg(punct_ratio), 4)", "avg(punct_ratio)")
            .replace("round(avg(stopword_ratio), 4)", "avg(stopword_ratio)")
            .replace("round(avg(mean_word_len), 4)", "avg(mean_word_len)"),
            [("avg_punct_ratio", 4), ("avg_stopword_ratio", 4), ("avg_word_len", 4)],
        ),
        (
            "q_doc_encode",
            q.Q_DOC_ENCODE_SQL.replace("round(avg(norm), 4)", "avg(norm)"),
            [("mean_norm", 4)],
        ),
    ]
    # conservative group size for the drift bound: the WHOLE corpus
    # (every real group is smaller, so drift is overestimated — the safe
    # direction for a margin assertion)
    n_total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    for name, sql, cols in checks:
        if name == "q_doc_encode" and not os.path.exists(
            "/tmp/coco_oracle_export/sf0.01/doc_embeddings.parquet"
        ):
            continue  # export-backed oracle: only checkable after a gate run
        df = con.execute(sql).fetchdf()
        for col, dec in cols:
            vals = df[col].to_numpy(dtype=np.float64)
            # per-group drift bound, worst group: n * eps * |mean|
            drift = float(np.max(np.abs(vals)) * n_total * eps)
            m = margin(vals, dec)
            assert m > 100 * drift, (name, col, m, drift)
