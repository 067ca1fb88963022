"""Gazetteer NER quality — precision/recall on a labeled fixture.

The reference's DAG does not only run NER, it *validates the output
rate* (airflow_home/dags/ner_dag.py:68-100 checks entities-per-article
bounds before loading). Determinism tests elsewhere pin that the
gazetteer extractor is a pure function; this file pins that what it
extracts is *good*: per-type precision/recall floors against a
hand-labeled Indonesian fixture set, plus the reference-style
extraction-rate band.

The fixture uses inline markup — ``[PER:Joko Widodo]`` — so gold span
offsets are derived, never hand-counted. Matching is exact-span
(type, start, end): boundary errors count as both a false positive
and a false negative, the strictest standard CoNLL-style scoring.
"""

from __future__ import annotations

import re

import pytest

from simple_etl_spark.operators.entities import gazetteer_extractor

_MARK = re.compile(r"\[(PER|ORG|LOC):([^\]]+)\]")


def _parse(marked: str) -> tuple[str, list[tuple[str, int, int]]]:
    """Strip ``[TYPE:span]`` markup, returning (plain_text, gold) with
    gold = [(etype, start, end)] in plain-text offsets."""
    out, gold, pos = [], [], 0
    plain_len = 0
    for m in _MARK.finditer(marked):
        out.append(marked[pos : m.start()])
        plain_len += m.start() - pos
        span = m.group(2)
        gold.append((m.group(1), plain_len, plain_len + len(span)))
        out.append(span)
        plain_len += len(span)
        pos = m.end()
    out.append(marked[pos:])
    return "".join(out), gold


# ~60 sentences in the reference's news-domain register. Coverage:
# gazetteer hits (cased + lowercase), ORG/LOC cue spans, person
# titles (leading and preceding), bare capitalized name pairs,
# sentence-final entities (the r9 trailing-dot regression), and
# entity-free sentences. A handful of known failure shapes are
# labeled with what a PERFECT extractor would find, so the floors
# stay honest measurements rather than tautologies.
SENTENCES = [
    "Presiden [PER:Joko Widodo] meresmikan jalan tol baru di [LOC:Surabaya].",
    "[ORG:KPK] menahan dua tersangka kasus suap di [LOC:Jakarta].",
    "Menteri [PER:Sri Mulyani] memaparkan anggaran di gedung [ORG:DPR].",
    "[ORG:Bank Indonesia] menahan suku bunga acuan bulan ini.",
    "Gubernur [PER:Ridwan Kamil] meninjau banjir di [LOC:Jawa Barat].",
    "[ORG:Pertamina] menaikkan harga bahan bakar non-subsidi.",
    "Tim [ORG:PSSI] berlatih di [LOC:Bali] menjelang turnamen.",
    "Harga beras di [LOC:Medan] naik sejak pekan lalu.",
    "[ORG:Universitas Gadjah Mada] membuka program studi baru.",
    "Dosen [ORG:Institut Teknologi Bandung] menerima penghargaan.",
    "[ORG:Kementerian Keuangan] merilis data penerimaan pajak.",
    "Warga [LOC:Kota Depok] mengeluhkan kemacetan setiap pagi.",
    "[ORG:Partai Demokrat] menggelar kongres nasional tahun depan.",
    "Wisatawan memadati [LOC:Pulau Lombok] saat libur panjang.",
    "Pendakian [LOC:Gunung Semeru] ditutup karena cuaca buruk.",
    "Banjir merendam tiga kecamatan di [LOC:Kabupaten Bekasi].",
    "[ORG:Bank Mandiri] meluncurkan aplikasi pembayaran digital.",
    "Jalur kereta [LOC:Semarang] menuju [LOC:Yogyakarta] normal kembali.",
    "Bupati [PER:Dedi Mulyadi] meresmikan pasar rakyat.",
    "Wakil [PER:Sandiaga Uno] menghadiri forum investasi.",
    "Profesor [PER:Bambang Brodjonegoro] menjadi pembicara utama.",
    "Dr. [PER:Tirta Mandira] mengedukasi warga soal vaksinasi.",
    "Ketua [ORG:MPR] membuka sidang tahunan kemarin.",
    "[PER:Megawati Soekarnoputri] memimpin rapat [ORG:PDIP] tertutup.",
    "[PER:Anies Baswedan] dan [PER:Ganjar Pranowo] bertemu di [LOC:Semarang].",
    "Pelatih menurunkan [PER:Egy Maulana] sejak menit pertama.",
    "[ORG:Garuda Indonesia] menambah rute penerbangan ke [LOC:Makassar].",
    "Nelayan [LOC:Aceh] mendapat bantuan kapal baru.",
    "Pembangunan smelter di [LOC:Sulawesi Selatan] hampir rampung.",
    "Gempa mengguncang [LOC:Nusa Tenggara Timur] dini hari.",
    "[ORG:Muhammadiyah] menetapkan awal puasa lebih cepat.",
    "[ORG:Nahdlatul Ulama] menggelar istigasah akbar.",
    "Direktur [PER:Budi Santoso] membantah tudingan itu.",
    "Harga cabai di pasar induk turun tipis.",
    "Pemerintah menyiapkan subsidi pupuk untuk petani.",
    "Musim hujan diperkirakan datang lebih lambat.",
    "Produksi padi nasional naik dua persen.",
    "Sekolah tatap muka kembali digelar penuh.",
    "jokowi meninjau proyek kereta cepat di [LOC:bandung] kemarin.",
    "kantor [ORG:pln] di [LOC:palembang] padam selama dua jam.",
    "laporan [ORG:bulog] menyebut stok beras aman hingga akhir tahun.",
    "[ORG:BPJS Kesehatan] menjamin biaya perawatan pasien itu.",
    "Kasus itu kini ditangani [ORG:Polri] bersama [ORG:TNI].",
    "Ekspor nikel dari [LOC:Kalimantan Timur] meningkat tajam.",
    "Festival budaya digelar di [LOC:Yogyakarta].",
    "[ORG:Telkom] memperluas jaringan serat optik ke [LOC:Papua].",
    "Walikota [PER:Bima Arya] menata ulang pedagang kaki lima.",
    "Jenderal [PER:Dudung Abdurachman] meninjau latihan gabungan.",
    "[ORG:Komisi Pemilihan Umum] menetapkan jadwal kampanye.",
    "[ORG:Badan Pusat Statistik] mencatat inflasi tahunan.",
    "[ORG:Lembaga Ilmu Pengetahuan] merilis kajian iklim.",
    "Penerbangan menuju [LOC:Bali] dialihkan karena abu vulkanik.",
    "[ORG:PT Freeport Indonesia] menambah kuota ekspor konsentrat.",
    "Haji [PER:Rhoma Irama] tampil di acara amal itu.",
    "Ustaz [PER:Abdul Somad] mengisi kajian subuh.",
    "Kiai [PER:Maruf Amin] menerima kunjungan santri.",
    "[ORG:Yayasan Kanker Indonesia] menggalang dana operasi.",
    "[ORG:Asosiasi Pengusaha Indonesia] menolak kenaikan tarif.",
    "Sidang kasus korupsi dilanjutkan pekan depan.",
    "Tarif tol dalam kota naik mulai besok.",
    # known-hard shapes the rule tiers cannot get — kept so the floors
    # measure genuine headroom instead of a tautological 1.0:
    # unknown single-word ORG reads as a bare name pair
    "Harian [ORG:Kompas] menurunkan laporan investigasi.",
    # mononym person: single capitalized word, skipped as too noisy
    "[PER:Raisa] menggelar konser amal di [LOC:Jakarta].",
    # sentence-initial function word glues onto the name
    "Menurut [PER:Budi], harga akan segera turun.",
    # station name: no cue in the lexicon, misread as a person
    "Stasiun [LOC:Gambir] dipadati penumpang arus balik.",
]


def _score() -> tuple[dict, dict, int, int]:
    tp: dict[str, int] = {"PER": 0, "ORG": 0, "LOC": 0}
    fp = dict(tp)
    fn = dict(tp)
    n_pred = n_gold = 0
    for marked in SENTENCES:
        text, gold = _parse(marked)
        pred = {(e, s, t) for _, e, _, s, t in gazetteer_extractor(text)}
        gset = {(e, s, t) for e, s, t in gold}
        n_pred += len(pred)
        n_gold += len(gset)
        for e, s, t in pred & gset:
            tp[e] += 1
        for e, s, t in pred - gset:
            fp[e] += 1
        for e, s, t in gset - pred:
            fn[e] += 1
    prec = {
        e: tp[e] / (tp[e] + fp[e]) if tp[e] + fp[e] else 1.0 for e in tp
    }
    rec = {
        e: tp[e] / (tp[e] + fn[e]) if tp[e] + fn[e] else 1.0 for e in tp
    }
    return prec, rec, n_pred, n_gold


def test_fixture_is_well_formed():
    texts = set()
    for marked in SENTENCES:
        text, gold = _parse(marked)
        assert "[" not in text and "]" not in text
        assert text not in texts, f"duplicate sentence: {text!r}"
        texts.add(text)
        for e, s, t in gold:
            assert 0 <= s < t <= len(text)


def test_gold_offsets_slice_back_to_span_text():
    for marked in SENTENCES:
        text, gold = _parse(marked)
        spans = [m.group(2) for m in _MARK.finditer(marked)]
        assert [text[s:t] for _, s, t in gold] == spans


def test_per_type_precision_recall_floors():
    prec, rec, _, _ = _score()
    # floors sit ~5 points under measured so real regressions trip
    # them while fixture tweaks don't; measured r11 (after the
    # reporting-cue PER class and the descriptor-noun ORG/LOC classes
    # closed three of the four labeled known-hard shapes — VERDICT r10
    # #2): P = {PER 1.0, ORG 1.0, LOC 1.0}, R = {PER .947, ORG 1.0,
    # LOC 1.0} — the one remaining miss is the bare mononym
    # ("Raisa"), which no cueless rule tier can license without
    # flooding false positives; it stays as genuine headroom
    floors_p = {"PER": 0.95, "ORG": 0.95, "LOC": 0.95}
    floors_r = {"PER": 0.90, "ORG": 0.95, "LOC": 0.95}
    for e in ("PER", "ORG", "LOC"):
        assert prec[e] >= floors_p[e], (e, "precision", prec)
        assert rec[e] >= floors_r[e], (e, "recall", rec)


def test_extraction_rate_band():
    """The reference DAG validates entities-per-article before loading
    (ner_dag.py:68-100); mirror that: the fixture's prediction rate
    must stay near its gold rate — a silent gazetteer breakage that
    still returns *something* everywhere trips this band."""
    _, _, n_pred, n_gold = _score()
    rate = n_pred / len(SENTENCES)
    gold_rate = n_gold / len(SENTENCES)
    assert 0.8 * gold_rate <= rate <= 1.2 * gold_rate, (rate, gold_rate)


def test_type_mix_is_stable():
    """Pin the type distribution shape: no type collapses to zero and
    no type swallows the others (the DAG's per-type sanity)."""
    counts = {"PER": 0, "ORG": 0, "LOC": 0}
    for marked in SENTENCES:
        text, _ = _parse(marked)
        for _, e, _, _, _ in gazetteer_extractor(text):
            counts[e] += 1
    total = sum(counts.values())
    assert total >= 50
    for e, c in counts.items():
        assert 0.10 <= c / total <= 0.60, (e, counts)


def test_spans_never_overlap():
    """Non-overlap invariant (code-review r10, reproduced): a
    case-insensitive gazetteer match can extend past a capitalized
    run ('Lembaga Bank indonesia'), and the ORG-cue span must yield
    to it rather than emit two entities sharing a token."""
    got = gazetteer_extractor("Lembaga Bank indonesia menggelar rapat.")
    assert [(e[0], e[1], e[2]) for e in got] == [
        ("Bank indonesia", "ORG", 0.95)
    ]
    for marked in SENTENCES:
        text, _ = _parse(marked)
        ents = sorted(gazetteer_extractor(text), key=lambda e: e[3])
        for a, b in zip(ents, ents[1:]):
            assert a[4] <= b[3], (text, a, b)


def test_abandoned_cue_fragment_does_not_become_per():
    """Second review pass (reproduced): when an ORG-cue span yields to
    a straddling gazetteer match, its leftover ≥2-token prefix must be
    consumed, not resurface from the bare tier as a fake person."""
    got = gazetteer_extractor("Lembaga Besar Bank indonesia menggelar rapat.")
    assert [(e[0], e[1], e[2]) for e in got] == [
        ("Bank indonesia", "ORG", 0.95)
    ]
