"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Every row is a pure function of ``(seed, doc_id)`` — ``gen_page_row`` seeds a
private RNG per document — so the same table can be synthesized on the
driver (tests), inside executors via mapInPandas (bench at any scale), or by
the golden-oracle script, and always byte-match.

Two document families:
- KTP-style labeled documents (lang='ind'): the reference's field layout
  (/root/reference/parsers.py:16 order) with OCR-style noise drawn ONLY from
  the confusion sets the reference repairs (todigits_typo map
  /root/reference/ocrfw/postprocessing.py:301-313, letters_evaluator map
  :268-279, get_re_pattern classes :11-32), budgeted under the engine's
  field thresholds so fields stay findable.
- Generic lorem-like pages (lang='en') that exercise boilerplate stripping
  and carry occasional ``Key : value`` lines.

The HTML payload wraps the document lines in a main-content div surrounded
by link-dense nav/header/footer/sidebar boilerplate plus script/style noise.
~5% of rows are text-only (html NULL), ~5% html-only (text NULL).
Host distribution is deliberately skewed (top host ~40% of rows).
"""

from __future__ import annotations

import datetime as _dt
import random

from ..kvcore import dictionaries

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_FIRST = ["BUDI", "SITI", "AGUS", "DEWI", "RINA", "JOKO", "SRI", "ANDI", "LILIS", "EKO",
          "WATI", "DEDI", "RATNA", "HENDRA", "YULI", "BAMBANG", "INDAH", "TONO", "MEGA", "RUDI"]
_LAST = ["SANTOSO", "WIJAYA", "SETIAWAN", "PRATAMA", "HIDAYAT", "KUSUMA", "NUGROHO",
         "SAPUTRA", "LESTARI", "WIBOWO", "HARTONO", "GUNAWAN", "SUSANTO", "RAHAYU"]
_STREETS = ["JL. MERDEKA", "JL. SUDIRMAN", "JL. DIPONEGORO", "JL. GATOT SUBROTO",
            "JL. AHMAD YANI", "JL. PAHLAWAN", "JL. KARTINI", "JL. MELATI"]
_VILLAGES = ["SUKAMAJU", "MEKARSARI", "CIBADAK", "KARANGASEM", "SIDOMULYO",
             "TANJUNGSARI", "WONOREJO", "BANJARSARI"]
_DISTRICTS = ["CICENDO", "GUBENG", "TEGALSARI", "MANTRIJERON", "SUKUN",
              "BANYUMANIK", "MEDAN BARU", "DENPASAR UTARA"]
_RELIGIONS = ["ISLAM", "KATHOLIK", "KRISTEN", "HINDU", "BUDDHA", "KONGHUCU"]
_MARITAL = ["KAWIN", "BELUM KAWIN", "CERAI HIDUP", "CERAI MATI"]
_BLOOD = ["A", "B", "AB", "O", "-"]

_LOREM = ("the quick brown fox jumps over a lazy dog while analytics pipelines "
          "stream terabytes of web text through columnar engines and distill "
          "clean training corpora from noisy markup every single day").split()

# Single-substitution confusion pairs (both directions appear in the
# reference's repair maps / regex classes), applied to KEY tokens.
_KEY_CONFUSION = {"I": "1", "i": "l", "l": "1", "1": "l", "o": "0", "O": "0",
                  "A": "4", "a": "4", "E": "3", "e": "3", "S": "5", "s": "5",
                  "B": "8", "g": "9"}
# Digit->letter confusions for VALUE digits (repaired by todigits_typo).
_DIGIT_CONFUSION = {"0": "O", "1": "l", "3": "E", "4": "A", "5": "S", "8": "B"}
# Letter->digit confusions for VALUE letters (repaired by letters_evaluator).
_LETTER_CONFUSION = {"A": "4", "S": "5", "B": "8", "O": "0", "I": "1", "E": "3", "G": "6"}

_HOSTS = [f"host{i:02d}.example.org" for i in range(50)]
_EPOCH = _dt.datetime(2024, 1, 1)


def _noise_key(rng: random.Random, token: str, max_subs: int) -> str:
    """Substitute up to max_subs chars of a key token from the confusion set."""
    if max_subs <= 0 or rng.random() < 0.45:
        return token
    chars = list(token)
    eligible = [i for i, c in enumerate(chars) if c in _KEY_CONFUSION]
    rng.shuffle(eligible)
    for i in eligible[: min(max_subs, 1 if len(token) <= 4 else max_subs)]:
        chars[i] = _KEY_CONFUSION[chars[i]]
    return "".join(chars)


def _noise_digits(rng: random.Random, value: str, rate: float = 0.12) -> str:
    return "".join(
        _DIGIT_CONFUSION[c] if (c in _DIGIT_CONFUSION and rng.random() < rate) else c
        for c in value
    )


def _noise_letters(rng: random.Random, value: str, rate: float = 0.1) -> str:
    return "".join(
        _LETTER_CONFUSION[c] if (c in _LETTER_CONFUSION and rng.random() < rate) else c
        for c in value
    )


def _sep(rng: random.Random) -> str:
    return rng.choice([" : ", ": ", " :", ":", "  :  "])


def gen_ktp_lines(rng: random.Random) -> list[str]:
    """One KTP-style labeled document (reference field order)."""
    dicts = dictionaries.load()
    prov_codes = list(dicts["prov_city_kec"].keys())
    prov_code = rng.choice(prov_codes)
    province = dicts["prov_city_kec"][prov_code][0]
    city = rng.choice(dicts["cities_list"])
    name = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
    birth_place = rng.choice(dicts["cities_list"]).replace("KOTA ", "").replace("KABUPATEN ", "")
    day = rng.randint(1, 28)
    month = rng.randint(1, 12)
    year = rng.randint(1950, 2005)
    female = rng.random() < 0.5
    gender = "PEREMPUAN" if female else "LAKI-LAKI"
    blood = rng.choice(_BLOOD)
    nik = (
        f"{prov_code}{rng.randint(1, 99):02d}{rng.randint(1, 99):02d}"
        f"{day + (40 if female else 0):02d}{month:02d}{year % 100:02d}"
        f"{rng.randint(1, 9999):04d}"
    )
    street = f"{rng.choice(_STREETS)} NO. {rng.randint(1, 199)}"
    rt, rw = rng.randint(1, 20), rng.randint(1, 15)
    village = rng.choice(_VILLAGES)
    district = rng.choice(_DISTRICTS)
    religion = rng.choice(_RELIGIONS)
    marital = rng.choice(_MARITAL)
    job = rng.choice(dicts["jobs"])
    valid = (
        "SEUMUR HIDUP"
        if rng.random() < 0.5
        else f"{rng.randint(1, 28):02d}-{rng.randint(1, 12):02d}-{rng.randint(2020, 2030)}"
    )

    lines = [
        f"PROVINSI {_noise_letters(rng, province, 0.06)}",
        f"{_noise_letters(rng, city, 0.06)}",
        f"{_noise_key(rng, 'NIK', 1)}{_sep(rng)}{_noise_digits(rng, nik)}",
        f"{_noise_key(rng, 'Nama', 1)}{_sep(rng)}{_noise_letters(rng, name)}",
        f"{_noise_key(rng, 'Tempat', 1)} {_noise_key(rng, 'Tgl', 1)} "
        f"{_noise_key(rng, 'Lahir', 1)}{_sep(rng)}{birth_place}, "
        f"{day:02d}-{month:02d}-{year}",
        f"{_noise_key(rng, 'Jenis', 1)} {_noise_key(rng, 'kelamin', 1)}{_sep(rng)}"
        f"{gender}  Gol darah{_sep(rng)}{blood}",
        f"{_noise_key(rng, 'Alamat', 1)}{_sep(rng)}{_noise_letters(rng, street, 0.05)}",
        f"RTRW{_sep(rng)}{rt:03d}/{rw:03d}",
        f"KelDesa{_sep(rng)}{_noise_letters(rng, village, 0.08)}",
        f"{_noise_key(rng, 'Kecamatan', 1)}{_sep(rng)}{_noise_letters(rng, district, 0.08)}",
        f"{_noise_key(rng, 'Agama', 1)}{_sep(rng)}{religion}",
        f"Status Perkawinan{_sep(rng)}{marital}",
        f"{_noise_key(rng, 'Pekerjaan', 1)}{_sep(rng)}{_noise_letters(rng, job, 0.05)}",
        f"{_noise_key(rng, 'Kewarganegaraan', 2)}{_sep(rng)}WNI",
        f"Berlaku Hingga{_sep(rng)}{valid}",
    ]
    return lines


def gen_generic_lines(rng: random.Random) -> list[str]:
    """Generic page body: 5-50 lorem-ish lines, some carrying Key : value."""
    n = rng.randint(5, 50)
    lines = []
    for i in range(n):
        words = [rng.choice(_LOREM) for _ in range(rng.randint(4, 14))]
        if rng.random() < 0.15:
            lines.append(f"Nama{_sep(rng)}{' '.join(words[:2]).upper()}")
        else:
            lines.append(" ".join(words))
    return lines


def _nav_block(rng: random.Random, n_links: int, tag: str = "nav") -> str:
    links = "".join(
        f'<li><a href="/{rng.choice(_LOREM)}/{i}">{rng.choice(_LOREM)} {rng.choice(_LOREM)}</a></li>'
        for i in range(n_links)
    )
    return f"<{tag}><ul>{links}</ul></{tag}>"


def render_html(rng: random.Random, lines: list[str], title: str) -> str:
    """Wrap document lines in boilerplate-heavy HTML.

    Main content = one <div class=main> with one <p> per line (entity-escaped);
    boilerplate = link-dense nav/header/footer/aside + script/style noise.
    """
    esc = [
        ln.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;") for ln in lines
    ]
    paras = "".join(f"<p>{ln}</p>" for ln in esc)
    return (
        "<html><head>"
        f"<title>{title}</title>"
        "<style>body{font:14px sans-serif} .x{color:red}</style>"
        "<script>var t=1;function f(){return t+1}</script>"
        "</head><body>"
        f"<header>{_nav_block(rng, rng.randint(4, 10), 'nav')}</header>"
        f'<aside><ul>{"".join(f"<li><a href=/s/{i}>{rng.choice(_LOREM)}</a></li>" for i in range(rng.randint(3, 8)))}</ul></aside>'
        f'<div class="main">{paras}</div>'
        f"<footer>{_nav_block(rng, rng.randint(4, 12), 'div')}"
        "<p>© 2024 example syndicate. all rights reserved.</p></footer>"
        "</body></html>"
    )


def gen_document(seed: int, doc_id: int) -> dict:
    """Deterministic document: returns dict with url/warc_ts/html/text/lang
    plus the raw main-content lines (for golden generation)."""
    rng = random.Random(f"{seed}:{doc_id}")
    is_ktp = rng.random() < 0.5
    lines = gen_ktp_lines(rng) if is_ktp else gen_generic_lines(rng)
    lang = "ind" if is_ktp else "en"

    # Skewed host distribution: top host ~40% of rows.
    host = _HOSTS[0] if rng.random() < 0.4 else rng.choice(_HOSTS[1:])
    url = f"https://{host}/doc/{doc_id:012d}"
    text = "\n".join(lines)
    html = render_html(rng, lines, title=f"doc {doc_id}")

    # ~5% text-only, ~5% html-only, never both NULL.
    r = rng.random()
    html_out: bytes | None = html.encode("utf-8")
    text_out: str | None = text
    if r < 0.05:
        html_out = None
    elif r < 0.10:
        text_out = None

    return {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=doc_id),
        "html": html_out,
        "text": text_out,
        "lang": lang,
        "_lines": lines,
    }


def gen_page_row(seed: int, doc_id: int) -> dict:
    row = gen_document(seed, doc_id)
    row.pop("_lines")
    return row


def gen_page_row_skewed(seed: int, doc_id: int, payload_factor: int = 4) -> dict:
    """Adversarial skew fixture (VERDICT r3 #7): same host mix as
    ``gen_page_row`` (top host ~40% of rows) but hot-host documents carry
    ``payload_factor``x the body lines — with the default 4x, roughly 73%
    of total extraction WORK lands on one host key.  Deterministic pure
    function of (seed, doc_id), so parallelism levels see byte-identical
    input."""
    rng = random.Random(f"{seed}:{doc_id}")
    is_ktp = rng.random() < 0.5
    lines = gen_ktp_lines(rng) if is_ktp else gen_generic_lines(rng)
    lang = "ind" if is_ktp else "en"
    host = _HOSTS[0] if rng.random() < 0.4 else rng.choice(_HOSTS[1:])
    if host == _HOSTS[0]:
        lines = lines * payload_factor
    url = f"https://{host}/doc/{doc_id:012d}"
    text = "\n".join(lines)
    html = render_html(rng, lines, title=f"doc {doc_id}")
    r = rng.random()
    html_out = html.encode("utf-8") if r >= 0.05 else None
    text_out = text if (r < 0.05 or r >= 0.10) else None
    return {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=doc_id),
        "html": html_out,
        "text": text_out,
        "lang": lang,
    }
