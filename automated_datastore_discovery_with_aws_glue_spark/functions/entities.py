"""PII entity registry — the detector catalog behind the classification
operator (SURVEY §2.4 A3 / §4.2.1).

The reference delegates detection to an opaque managed transform
(`awsglueml.transforms.EntityDetector`, invoked at
`scripts/glue/s3-source/s3-source-script.py:302-308`) over ~240 entity-type
names (`:24-281`). This registry re-implements that capability surface in
the open: every entity name the reference accepts resolves here to a
format regex (anchored, evaluated against trimmed cell values) plus
optional column-name context hints and a checksum-validator tag.

Formats come from public documentation (ISO 7812 card numbers, ITU E.164,
IBAN country layouts, EU VAT layouts, national-ID formats). Entities whose
real-world format is not fully determined by a regex (PERSON_NAME, many
driving-license formats) carry ``approximate=True``; threshold semantics
make this safe — a detector that over-matches slightly still only fires
when a meaningful fraction of a column matches.

Regexes are RE2-compatible (no lookarounds) so the same pattern runs under
Spark's `rlike` (Java) and the DuckDB oracle's `regexp_matches`.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EntitySpec:
    name: str
    pattern: str  # anchored automatically: matched as ^(?:pattern)$
    context: tuple[str, ...] = ()  # column-name hints (lowercase substrings)
    validator: str | None = None  # optional checksum: luhn | mod97 | nhs
    approximate: bool = False
    # For ``approximate`` entities whose alternation mixes a generic form
    # (hint-gated) with a form the regex fully determines (e.g. the dashed
    # 123-45-6789 SSN layout): the fully-determined sub-pattern. The
    # classifier lets a column whose values match THIS form clear the
    # context gate without a column-name hint — only the generic
    # alternative stays hint-gated.
    exact_pattern: str | None = None

    @property
    def anchored(self) -> str:
        return f"^(?:{self.pattern})$"

    @property
    def anchored_exact(self) -> str:
        return f"^(?:{self.exact_pattern})$"


def _spec(name, pattern, context=(), validator=None, approximate=False, exact_pattern=None):
    return EntitySpec(name, pattern, tuple(context), validator, approximate, exact_pattern)


# ---------------------------------------------------------------------------
# Universal entities
# ---------------------------------------------------------------------------

_D = r"[0-9]"
_SEP = r"[ -]?"

_UNIVERSAL = [
    _spec("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", ("email", "e-mail", "mail")),
    _spec(
        "PHONE_NUMBER",
        r"\+?[0-9][0-9 ().-]{7,14}[0-9]",
        ("phone", "telephone", "mobile", "msisdn", "cell"),
        approximate=True,
    ),
    _spec(
        "CREDIT_CARD",
        # ISO/IEC 7812: 13-19 digits, optionally grouped 4-4-4-4
        rf"(?:{_D}{{4}}{_SEP}{_D}{{4}}{_SEP}{_D}{{4}}{_SEP}{_D}{{1,7}})|{_D}{{13,19}}",
        ("card", "credit", "pan", "payment"),
        validator="luhn",
    ),
    _spec(
        "IP_ADDRESS",
        r"(?:(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})\.){3}(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})"
        r"|(?:[0-9A-Fa-f]{1,4}:){2,7}[0-9A-Fa-f:]{1,24}",
        ("ip", "addr", "host"),
    ),
    _spec("MAC_ADDRESS", r"(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}", ("mac",)),
    _spec(
        "PERSON_NAME",
        # heuristic: 2-4 capitalized words, optional particles/initials
        r"[A-Z][a-zA-Z'.-]+(?: (?:[A-Z][a-zA-Z'.-]+|[a-z]{2,3}|[A-Z]\.)){1,3}",
        ("name", "person", "customer", "account_name", "holder"),
        approximate=True,
    ),
    _spec(
        "BANK_ACCOUNT",
        # generic account number: 8-17 digits, or IBAN shape
        rf"{_D}{{8,17}}|[A-Z]{{2}}{_D}{{2}}[A-Z0-9]{{11,30}}",
        ("account", "acct", "iban"),
        validator="mod97",  # enforced on IBAN-shaped values only
        approximate=True,
    ),
]

# ---------------------------------------------------------------------------
# USA
# ---------------------------------------------------------------------------

_USA = [
    # the bare \d{9} alternative is a generic digit run and stays
    # hint-gated; the dashed 123-45-6789 layout IS fully determined by
    # the regex, so it is declared as the exact sub-form — columns of
    # dashed SSNs classify without needing an 'ssn'/'social' header
    _spec(
        "USA_SSN",
        rf"{_D}{{3}}-{_D}{{2}}-{_D}{{4}}|{_D}{{9}}",
        ("ssn", "social"),
        approximate=True,
        exact_pattern=rf"{_D}{{3}}-{_D}{{2}}-{_D}{{4}}",
    ),
    # ITIN: 9xx-7x/8x/9x-xxxx; ATIN 9xx-93-xxxx; PTIN P followed by 8 digits
    _spec("USA_ITIN", rf"9{_D}{{2}}-?[78]{_D}-?{_D}{{4}}", ("itin",)),
    _spec("USA_ATIN", rf"9{_D}{{2}}-?93-?{_D}{{4}}", ("atin",)),
    _spec("USA_PTIN", rf"[Pp]{_D}{{8}}", ("ptin",)),
    _spec("USA_PASSPORT_NUMBER", rf"[A-Z]?{_D}{{8,9}}", ("passport",), approximate=True),
    _spec("USA_DRIVING_LICENSE", rf"[A-Z]{{1,2}}{_D}{{5,12}}|{_D}{{7,9}}", ("license", "licence", "dl"), approximate=True),
    _spec("USA_HCPCS_CODE", rf"[A-V]{_D}{{4}}", ("hcpcs",)),
    _spec("USA_NATIONAL_DRUG_CODE", rf"{_D}{{4,5}}-{_D}{{3,4}}-{_D}{{1,2}}", ("ndc", "drug")),
    _spec("USA_NATIONAL_PROVIDER_IDENTIFIER", rf"[12]{_D}{{9}}", ("npi", "provider")),
    _spec("USA_DEA_NUMBER", rf"[A-Z]{{2}}{_D}{{7}}", ("dea",)),
    _spec("USA_HEALTH_INSURANCE_CLAIM_NUMBER", rf"{_D}{{9}}[A-Z][A-Z0-9]?", ("hicn", "claim")),
    _spec("USA_MEDICARE_BENEFICIARY_IDENTIFIER", r"[1-9][AC-HJKMNP-RT-Y][AC-HJKMNP-RT-Y0-9][0-9]-?[AC-HJKMNP-RT-Y][AC-HJKMNP-RT-Y0-9][0-9]-?[AC-HJKMNP-RT-Y]{2}[0-9]{2}", ("mbi", "medicare")),
]

# ---------------------------------------------------------------------------
# UK
# ---------------------------------------------------------------------------

_UK = [
    _spec("UK_BANK_ACCOUNT", rf"{_D}{{8}}", ("account",), approximate=True),
    _spec(
        "UK_BANK_SORT_CODE",
        rf"{_D}{{2}}-{_D}{{2}}-{_D}{{2}}|{_D}{{6}}",
        ("sort",),
        approximate=True,
        # the dashed 12-34-56 layout is fully determined; only the bare
        # 6-digit run stays hint-gated
        exact_pattern=rf"{_D}{{2}}-{_D}{{2}}-{_D}{{2}}",
    ),
    _spec("UK_DRIVING_LICENSE", rf"[A-Z9]{{5}}{_D}{{6}}[A-Z9]{{2}}{_D}[A-Z]{{2}}", ("license", "licence")),
    _spec("UK_ELECTORAL_ROLL_NUMBER", rf"[A-Z]{{2,3}}{_D}{{1,4}}", ("electoral",), approximate=True),
    _spec("UK_NATIONAL_HEALTH_SERVICE_NUMBER", rf"{_D}{{3}}[ -]?{_D}{{3}}[ -]?{_D}{{4}}", ("nhs",), validator="nhs"),
    _spec("UK_NATIONAL_INSURANCE_NUMBER", rf"[A-CEGHJ-PR-TW-Z]{{2}}{_D}{{6}}[A-D]", ("insurance", "nino", "ni_number")),
    _spec("UK_PASSPORT_NUMBER", rf"{_D}{{9}}", ("passport",), approximate=True),
    _spec("UK_PHONE_NUMBER", rf"(?:\+44[ -]?|0){_D}{{2,4}}[ -]?{_D}{{3,4}}[ -]?{_D}{{3,4}}", ("phone", "telephone")),
    _spec("UK_UNIQUE_TAXPAYER_REFERENCE_NUMBER", rf"{_D}{{9,10}}", ("utr", "taxpayer"), approximate=True),
    _spec("UK_VALUE_ADDED_TAX", rf"(?:GB)?{_D}{{9}}(?:{_D}{{3}})?", ("vat",), approximate=True),
]

# ---------------------------------------------------------------------------
# Japan
# ---------------------------------------------------------------------------

_JAPAN = [
    _spec("JAPAN_BANK_ACCOUNT", rf"{_D}{{7,8}}", ("account",), approximate=True),
    _spec("JAPAN_DRIVING_LICENSE", rf"{_D}{{12}}", ("license", "licence"), approximate=True),
    _spec("JAPAN_MY_NUMBER", rf"{_D}{{4}}[ -]?{_D}{{4}}[ -]?{_D}{{4}}", ("my_number", "mynumber")),
    _spec("JAPAN_PASSPORT_NUMBER", rf"[A-Z]{{2}}{_D}{{7}}", ("passport",)),
]

# ---------------------------------------------------------------------------
# Generated families (EU VAT layouts, passports, driving licenses,
# national IDs). Formats per public documentation; entries not fully
# determined by their public spec are approximate.
# ---------------------------------------------------------------------------

# EU-style VAT layouts (country code optional in data entry)
_VAT_LAYOUTS = {
    "AUSTRIA": rf"(?:ATU)?{_D}{{8}}",
    "BELGIUM": rf"(?:BE)?[01]{_D}{{9}}",
    "BULGARIA": rf"(?:BG)?{_D}{{9,10}}",
    "CYPRUS": rf"(?:CY)?{_D}{{8}}[A-Z]",
    "CZECHIA": rf"(?:CZ)?{_D}{{8,10}}",
    "DENMARK": rf"(?:DK)?{_D}{{8}}",
    "ESTONIA": rf"(?:EE)?{_D}{{9}}",
    "FINLAND": rf"(?:FI)?{_D}{{8}}",
    "FRANCE": rf"(?:FR)?[A-Z0-9]{{2}}{_D}{{9}}",
    "GERMANY": rf"(?:DE)?{_D}{{9}}",
    "GREECE": rf"(?:EL|GR)?{_D}{{9}}",
    "HUNGARY": rf"(?:HU)?{_D}{{8}}",
    "ICELAND": rf"(?:IS)?{_D}{{5,6}}",
    "IRELAND": rf"(?:IE)?{_D}[A-Z0-9+*]{_D}{{5}}[A-Z]{{1,2}}",
    "ITALY": rf"(?:IT)?{_D}{{11}}",
    "LATVIA": rf"(?:LV)?{_D}{{11}}",
    "LITHUANIA": rf"(?:LT)?(?:{_D}{{9}}|{_D}{{12}})",
    "LUXEMBOURG": rf"(?:LU)?{_D}{{8}}",
    "MALTA": rf"(?:MT)?{_D}{{8}}",
    "NETHERLANDS": rf"(?:NL)?{_D}{{9}}B{_D}{{2}}",
    "NORWAY": rf"(?:NO)?{_D}{{9}}(?:MVA)?",
    "POLAND": rf"(?:PL)?{_D}{{10}}",
    "PORTUGAL": rf"(?:PT)?{_D}{{9}}",
    "ROMANIA": rf"(?:RO)?{_D}{{2,10}}",
    "SERBIA": rf"(?:RS)?{_D}{{9}}",
    "SLOVAKIA": rf"(?:SK)?{_D}{{10}}",
    "SLOVENIA": rf"(?:SI)?{_D}{{8}}",
    "SPAIN": rf"(?:ES)?[A-Z0-9]{_D}{{7}}[A-Z0-9]",
    "SWEDEN": rf"(?:SE)?{_D}{{12}}",
    "SWITZERLAND": rf"(?:CHE)?[ -.]?{_D}{{3}}[ .]?{_D}{{3}}[ .]?{_D}{{3}}",
    "TURKEY": rf"(?:TR)?{_D}{{10}}",
    "VENEZUELA": rf"[JGVE]-?{_D}{{8}}-?{_D}",
}

# Passport layouts (letters+digits; approximate where the spec allows ranges)
_PASSPORT_LAYOUTS = {
    "AUSTRALIA": rf"[A-Z]{{1,2}}{_D}{{7}}",
    "AUSTRIA": rf"[A-Z]{_D}{{7}}",
    "BELGIUM": rf"[A-Z]{{2}}{_D}{{6}}",
    "CANADA": rf"[A-Z]{{2}}{_D}{{6}}",
    "CHINA": rf"[EG]{_D}{{8}}",
    "CROATIA": rf"{_D}{{9}}",
    "CYPRUS": rf"[A-Z]{_D}{{6,8}}",
    "ESTONIA": rf"[A-Z]{_D}{{7}}",
    "FINLAND": rf"[A-Z]{{2}}{_D}{{7}}",
    "FRANCE": rf"{_D}{{2}}[A-Z]{{2}}{_D}{{5}}",
    "GERMANY": rf"[CFGHJKLMNPRTVWXYZ][A-Z0-9]{{8}}",
    "GREECE": rf"[A-Z]{{2}}{_D}{{7}}",
    "HUNGARY": rf"[A-Z]{{2}}{_D}{{6,7}}",
    "ICELAND": rf"[A-Z]{{1,2}}{_D}{{6,7}}",
    "IRELAND": rf"[A-Z]{{2}}{_D}{{7}}",
    "ITALY": rf"[A-Z]{{2}}{_D}{{7}}",
    "KOREA": rf"[MSRODG]{_D}{{8}}",
    "LATVIA": rf"[A-Z]{{2}}{_D}{{7}}",
    "LIECHTENSTEIN": rf"[A-Z]{_D}{{5,6}}",
    "LUXEMBOURG": rf"[A-Z0-9]{{8}}",
    "MALAYSIA": rf"[AHK]{_D}{{8}}",
    "MEXICO": rf"{_D}{{10,11}}",
    "NETHERLANDS": rf"[A-NP-Z]{{2}}[A-NP-Z0-9]{{6}}{_D}",
    "PHILIPPINES": rf"[A-Z]{{1,2}}{_D}{{7}}[A-Z]?",
    "POLAND": rf"[A-Z]{{2}}{_D}{{7}}",
    "PORTUGAL": rf"[A-Z]{{1,2}}{_D}{{6,7}}",
    "ROMANIA": rf"{_D}{{8,9}}",
    "SINGAPORE": rf"[EK]{_D}{{7}}[A-Z]",
    "SLOVAKIA": rf"[A-Z]{{2}}{_D}{{7}}",
    "SLOVENIA": rf"[A-Z]{{2}}{_D}{{7}}",
    "SPAIN": rf"[A-Z]{{2,3}}{_D}{{6}}",
    "SWEDEN": rf"{_D}{{8}}",
    "SWITZERLAND": rf"[A-Z]{_D}{{7}}",
    "TAIWAN": rf"{_D}{{9}}",
    "THAILAND": rf"[A-Z]{{1,2}}{_D}{{6,7}}",
    "TURKEY": rf"[A-Z]{_D}{{8}}",
    "UKRAINE_DOMESTIC": rf"[А-ЯA-Z]{{2}}{_D}{{6}}",
    "UKRAINE_INTERNATIONAL": rf"[A-Z]{{2}}{_D}{{6}}",
}

# Driving-license layouts (mostly digit strings; approximate)
_DL_LAYOUTS = {
    "AUSTRALIA": rf"{_D}{{6,10}}",
    "AUSTRIA": rf"{_D}{{8}}",
    "BELGIUM": rf"{_D}{{10}}",
    "BULGARIA": rf"{_D}{{9}}",
    "CANADA": rf"[A-Z]{_D}{{4}}-?{_D}{{5}}-?{_D}{{5}}|{_D}{{6,9}}",
    "CHILE": rf"{_D}{{7,8}}",
    "CROATIA": rf"{_D}{{8}}",
    "CYPRUS": rf"{_D}{{6,12}}",
    "CZECHIA": rf"[A-Z]{{2}}{_D}{{6}}|{_D}{{8}}",
    "DENMARK": rf"{_D}{{8}}",
    "ESTONIA": rf"[A-Z]{{2}}{_D}{{6}}",
    "FINLAND": rf"{_D}{{10}}",
    "FRANCE": rf"{_D}{{12}}",
    "GERMANY": rf"[A-Z0-9]{{2}}{_D}{{2}}[A-Z0-9]{{6}}{_D}",
    "GREECE": rf"{_D}{{9}}",
    "HUNGARY": rf"[A-Z]{{2}}{_D}{{6}}",
    "IRELAND": rf"{_D}{{9}}",
    "ITALY": rf"[A-Z]{{2}}{_D}{{7}}[A-Z]",
    "LATVIA": rf"[A-Z]{{2}}{_D}{{6}}",
    "LITHUANIA": rf"{_D}{{8}}",
    "LUXEMBOURG": rf"{_D}{{6}}",
    "MALTA": rf"{_D}{{8}}",
    "MEXICO": rf"[A-Z0-9]{{6,12}}",
    "NETHERLANDS": rf"{_D}{{10}}",
    "NEW_ZEALAND": rf"[A-Z]{{2}}{_D}{{6}}",
    "NORWAY": rf"{_D}{{11}}",
    "PHILIPPINES": rf"[A-Z]{_D}{{2}}-{_D}{{2}}-{_D}{{6}}",
    "POLAND": rf"{_D}{{5}}/{_D}{{2}}/{_D}{{4}}|{_D}{{11}}",
    "PORTUGAL": rf"[A-Z]{{1,2}}-?{_D}{{6,7}}",
    "ROMANIA": rf"[A-Z]{_D}{{8}}",
    "SINGAPORE": rf"[STFG]{_D}{{7}}[A-Z]",
    "SLOVAKIA": rf"[A-Z]{{2}}{_D}{{6}}",
    "SLOVENIA": rf"{_D}{{9}}",
    "SPAIN": rf"{_D}{{8}}[A-Z]",
    "SWEDEN": rf"{_D}{{6}}[-+]{_D}{{4}}",
    "VENEZUELA": rf"{_D}{{7,9}}",
}

# 13-digit unique master citizen numbers (ex-Yugoslavia JMBG)
_UMCN_REGIONS = ("BOSNIA", "KOSOVO", "MACEDONIA", "MONTENEGRO", "VOJVODINA", "SERBIA", "SLOVENIA")

# National identification / tax / health IDs with documented shapes
_NATIONAL_IDS = {
    "ARGENTINA_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{2}}-?{_D}{{8}}-?{_D}",
    "AUSTRALIA_BUSINESS_NUMBER": rf"{_D}{{2}}[ ]?{_D}{{3}}[ ]?{_D}{{3}}[ ]?{_D}{{3}}",
    "AUSTRALIA_COMPANY_NUMBER": rf"{_D}{{3}}[ ]?{_D}{{3}}[ ]?{_D}{{3}}",
    "AUSTRALIA_MEDICARE_NUMBER": rf"[2-6]{_D}{{3}}[ ]?{_D}{{5}}[ ]?{_D}[ ]?/?{_D}?",
    "AUSTRALIA_TAX_FILE_NUMBER": rf"{_D}{{3}}[ ]?{_D}{{3}}[ ]?{_D}{{2,3}}",
    "AUSTRIA_SSN": rf"{_D}{{4}}[ ]?{_D}{{6}}",
    "AUSTRIA_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{2}}-{_D}{{3}}/{_D}{{4}}|{_D}{{9}}",
    "BELGIUM_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{2}}\.?{_D}{{2}}\.?{_D}{{2}}-?{_D}{{3}}\.?{_D}{{2}}",
    "BELGIUM_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{11}}",
    "BRAZIL_BANK_ACCOUNT": rf"{_D}{{4}}-?{_D}|{_D}{{5,12}}",
    "BRAZIL_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{1,2}}\.?{_D}{{3}}\.?{_D}{{3}}-?[0-9X]",
    "BRAZIL_NATIONAL_REGISTRY_OF_LEGAL_ENTITIES_NUMBER": rf"{_D}{{2}}\.?{_D}{{3}}\.?{_D}{{3}}/?{_D}{{4}}-?{_D}{{2}}",
    "BRAZIL_NATURAL_PERSON_REGISTRY_NUMBER": rf"{_D}{{3}}\.?{_D}{{3}}\.?{_D}{{3}}-?{_D}{{2}}",
    "BULGARIA_UNIFORM_CIVIL_NUMBER": rf"{_D}{{10}}",
    "CANADA_GOVERNMENT_IDENTIFICATION_CARD_NUMBER": rf"{_D}{{8,10}}",
    "CANADA_PERMANENT_RESIDENCE_NUMBER": rf"{_D}{{8,10}}",
    "CANADA_PERSONAL_HEALTH_NUMBER": rf"{_D}{{9,10}}",
    "CANADA_SOCIAL_INSURANCE_NUMBER": rf"{_D}{{3}}[- ]?{_D}{{3}}[- ]?{_D}{{3}}",
    "CHILE_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{1,2}}\.?{_D}{{3}}\.?{_D}{{3}}-?[0-9Kk]",
    "CHINA_IDENTIFICATION": rf"{_D}{{17}}[0-9Xx]",
    "CHINA_LICENSE_PLATE_NUMBER": rf"[一-鿿][A-Z][A-Z0-9]{{5,6}}",
    "CHINA_MAINLAND_TRAVEL_PERMIT_ID_HONG_KONG_MACAU": rf"[HM]{_D}{{8,10}}",
    "CHINA_MAINLAND_TRAVEL_PERMIT_ID_TAIWAN": rf"{_D}{{8}}(?:\(?[0-9A-Z]\)?)?",
    "CHINA_PHONE_NUMBER": rf"(?:\+?86[ -]?)?1[3-9]{_D}{{9}}",
    "COLOMBIA_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6,10}}",
    "COLOMBIA_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{8,10}}-?{_D}?",
    "CROATIA_IDENTITY_NUMBER": rf"{_D}{{9}}",
    "CROATIA_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}{{11}}",
    "CYPRUS_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{10}}",
    "CYPRUS_TAX_IDENTIFICATION_NUMBER": rf"[09]{_D}{{7}}[A-Z]",
    "CZECHIA_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6}}/?{_D}{{3,4}}",
    "DENMARK_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6}}-?{_D}{{4}}",
    "DENMARK_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{6}}-?{_D}{{4}}",
    "ESTONIA_PERSONAL_IDENTIFICATION_CODE": rf"[1-6]{_D}{{10}}",
    "FINLAND_HEALTH_INSURANCE_NUMBER": rf"{_D}{{10}}",
    "FINLAND_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6}}[-+A]{_D}{{3}}[0-9A-Y]",
    "FRANCE_BANK_ACCOUNT": rf"FR{_D}{{2}}[A-Z0-9]{{23}}|{_D}{{5}}[ ]?{_D}{{5}}[ ]?[A-Z0-9]{{11}}[ ]?{_D}{{2}}",
    "FRANCE_HEALTH_INSURANCE_NUMBER": rf"{_D}{{13}}(?:[ ]?{_D}{{2}})?",
    "FRANCE_INSEE_CODE": rf"[12]{_D}{{2}}[01]{_D}{{10}}(?:{_D}{{2}})?",
    "FRANCE_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{12}}",
    "FRANCE_TAX_IDENTIFICATION_NUMBER": rf"[0-3]{_D}{{12}}",
    "GERMANY_BANK_ACCOUNT": rf"DE{_D}{{2}}{_D}{{18}}|{_D}{{10}}",
    "GERMANY_PERSONAL_IDENTIFICATION_NUMBER": rf"[CFGHJKLMNPRTVWXYZ][A-Z0-9]{{8}}",
    "GERMANY_TAX_IDENTIFICATION_NUMBER": rf"[1-9]{_D}{{10}}",
    "GREECE_SSN": rf"{_D}{{11}}",
    "GREECE_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{9}}",
    "HONG_KONG_IDENTITY_CARD": rf"[A-Z]{{1,2}}{_D}{{6}}\(?[0-9A]\)?",
    "HUNGARY_SSN": rf"{_D}{{3}}[- ]?{_D}{{3}}[- ]?{_D}{{3}}",
    "HUNGARY_TAX_IDENTIFICATION_NUMBER": rf"8{_D}{{9}}",
    "ICELAND_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6}}-?{_D}{{4}}",
    "INDIA_AADHAAR_NUMBER": rf"[2-9]{_D}{{3}}[ -]?{_D}{{4}}[ -]?{_D}{{4}}",
    "INDIA_PERMANENT_ACCOUNT_NUMBER": rf"[A-Z]{{5}}{_D}{{4}}[A-Z]",
    "INDONESIA_IDENTITY_CARD_NUMBER": rf"{_D}{{16}}",
    "IRELAND_PERSONAL_PUBLIC_SERVICE_NUMBER": rf"{_D}{{7}}[A-W][A-IW]?",
    "IRELAND_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{7}}[A-W][A-IW]?",
    "ISRAEL_IDENTIFICATION_NUMBER": rf"{_D}{{9}}",
    "ITALY_BANK_ACCOUNT": rf"IT{_D}{{2}}[A-Z]{_D}{{10}}[A-Z0-9]{{12}}",
    "ITALY_FISCAL_CODE": rf"[A-Z]{{6}}{_D}{{2}}[A-EHLMPRST][0-7]{_D}[A-Z]{_D}{{3}}[A-Z]",
    "KOREA_RESIDENCE_REGISTRATION_NUMBER_FOR_CITIZENS": rf"{_D}{{6}}-?[1-4]{_D}{{6}}",
    "KOREA_RESIDENCE_REGISTRATION_NUMBER_FOR_FOREIGNERS": rf"{_D}{{6}}-?[5-8]{_D}{{6}}",
    "LATVIA_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6}}-?{_D}{{5}}",
    "LIECHTENSTEIN_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{4,12}}",
    "LIECHTENSTEIN_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{4,12}}",
    "LITHUANIA_PERSONAL_IDENTIFICATION_NUMBER": rf"[1-6]{_D}{{10}}",
    "LITHUANIA_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{10,11}}",
    "LUXEMBOURG_NATIONAL_INDIVIDUAL_NUMBER": rf"{_D}{{13}}",
    "LUXEMBOURG_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{13}}",
    "MACAU_RESIDENT_IDENTITY_CARD": rf"[157]{_D}{{6}}\(?{_D}\)?",
    "MALAYSIA_MYKAD_NUMBER": rf"{_D}{{6}}-?{_D}{{2}}-?{_D}{{4}}",
    "MALTA_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{7}}[MGAPLHBZ]",
    "MALTA_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{7}}[MGAPLHBZ]|{_D}{{9}}",
    "MEXICO_CLABE_NUMBER": rf"{_D}{{18}}",
    "MEXICO_TAX_IDENTIFICATION_NUMBER": rf"[A-Z&]{{3,4}}{_D}{{6}}[A-Z0-9]{{3}}",
    "MEXICO_UNIQUE_POPULATION_REGISTRY_CODE": rf"[A-Z]{{4}}{_D}{{6}}[HM][A-Z]{{5}}[A-Z0-9]{_D}",
    "NETHERLANDS_BANK_ACCOUNT": rf"NL{_D}{{2}}[A-Z]{{4}}{_D}{{10}}",
    "NETHERLANDS_CITIZEN_SERVICE_NUMBER": rf"{_D}{{8,9}}",
    "NETHERLANDS_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{9}}",
    "NEW_ZEALAND_NATIONAL_HEALTH_INDEX_NUMBER": rf"[A-HJ-NP-Z]{{3}}{_D}{{4}}|[A-HJ-NP-Z]{{3}}{_D}{{2}}[A-HJ-NP-Z]{{2}}",
    "NEW_ZEALAND_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{8,9}}",
    "NORWAY_BIRTH_NUMBER": rf"{_D}{{6}}[ ]?{_D}{{5}}",
    "NORWAY_HEALTH_INSURANCE_NUMBER": rf"{_D}{{11}}",
    "NORWAY_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{11}}",
    "PHILIPPINES_PASSPORT_NUMBER": rf"[A-Z]{{1,2}}{_D}{{7}}[A-Z]?",
    "POLAND_IDENTIFICATION_NUMBER": rf"{_D}{{11}}",
    "POLAND_REGON_NUMBER": rf"{_D}{{9}}|{_D}{{14}}",
    "POLAND_SSN": rf"{_D}{{11}}",
    "POLAND_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{3}}-?{_D}{{3}}-?{_D}{{2}}-?{_D}{{2}}|{_D}{{10}}",
    "PORTUGAL_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{8}}[ ]?{_D}[ ]?[A-Z0-9]{{2}}{_D}",
    "PORTUGAL_TAX_IDENTIFICATION_NUMBER": rf"[1-9]{_D}{{8}}",
    "ROMANIA_NUMERICAL_PERSONAL_CODE": rf"[1-9]{_D}{{12}}",
    "SINGAPORE_NATIONAL_REGISTRY_IDENTIFICATION_NUMBER": rf"[STFGM]{_D}{{7}}[A-Z]",
    "SINGAPORE_UNIQUE_ENTITY_NUMBER": rf"{_D}{{8,9}}[A-Z]|[TSR]{_D}{{2}}[A-Z]{{2}}{_D}{{4}}[A-Z]",
    "SLOVAKIA_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6}}/?{_D}{{3,4}}",
    "SLOVENIA_TAX_IDENTIFICATION_NUMBER": rf"[1-9]{_D}{{7}}",
    "SOUTH_AFRICA_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}{{10}}[01]{_D}{{2}}",
    "SPAIN_BANK_ACCOUNT": rf"ES{_D}{{2}}{_D}{{20}}",
    "SPAIN_DNI": rf"{_D}{{8}}-?[A-Z]",
    "SPAIN_NIE": rf"[XYZ]-?{_D}{{7}}-?[A-Z]",
    "SPAIN_NIF": rf"[0-9KLM]{_D}{{7}}[A-Z]",
    "SPAIN_SSN": rf"{_D}{{2}}/?{_D}{{8}}/?{_D}{{2}}",
    "SRI_LANKA_NATIONAL_IDENTIFICATION_NUMBER": rf"{_D}{{9}}[VvXx]|{_D}{{12}}",
    "SWEDEN_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}{{6,8}}[-+]?{_D}{{4}}",
    "SWEDEN_TAX_IDENTIFICATION_NUMBER": rf"{_D}{{6,8}}[-+]?{_D}{{4}}",
    "SWITZERLAND_AHV": rf"756\.?{_D}{{4}}\.?{_D}{{4}}\.?{_D}{{2}}",
    "SWITZERLAND_HEALTH_INSURANCE_NUMBER": rf"80756{_D}{{15}}",
    "TAIWAN_NATIONAL_IDENTIFICATION_NUMBER": rf"[A-Z][12]{_D}{{8}}",
    "THAILAND_PERSONAL_IDENTIFICATION_NUMBER": rf"{_D}[ -]?{_D}{{4}}[ -]?{_D}{{5}}[ -]?{_D}{{2}}[ -]?{_D}",
    "TURKEY_NATIONAL_IDENTIFICATION_NUMBER": rf"[1-9]{_D}{{10}}",
    "UKRAINE_INDIVIDUAL_IDENTIFICATION_NUMBER": rf"{_D}{{10}}",
    "UNITED_ARAB_EMIRATES_PERSONAL_NUMBER": rf"784-?{_D}{{4}}-?{_D}{{7}}-?{_D}",
    "VENEZUELA_NATIONAL_IDENTIFICATION_NUMBER": rf"[VE]-?{_D}{{7,9}}",
}


def _build_registry() -> dict[str, EntitySpec]:
    registry: dict[str, EntitySpec] = {}

    def add(spec: EntitySpec) -> None:
        registry[spec.name] = spec

    for spec in _UNIVERSAL + _USA + _UK + _JAPAN:
        add(spec)

    for country, rx in _VAT_LAYOUTS.items():
        add(_spec(f"{country}_VALUE_ADDED_TAX", rx, ("vat", "tax")))

    for country, rx in _PASSPORT_LAYOUTS.items():
        if country.startswith("UKRAINE"):
            kind = country.split("_", 1)[1]
            name = f"UKRAINE_PASSPORT_NUMBER_{kind}"
        else:
            name = f"{country}_PASSPORT_NUMBER"
        add(_spec(name, rx, ("passport",), approximate=True))

    for country, rx in _DL_LAYOUTS.items():
        add(_spec(f"{country}_DRIVING_LICENSE", rx, ("license", "licence", "driving"), approximate=True))

    for regionname in _UMCN_REGIONS:
        add(
            _spec(
                f"{regionname}_UNIQUE_MASTER_CITIZEN_NUMBER",
                rf"{_D}{{13}}",
                ("umcn", "jmbg", "citizen"),
                approximate=True,
            )
        )

    for name, rx in _NATIONAL_IDS.items():
        if name.endswith("_BANK_ACCOUNT"):
            # layouts with an IBAN alternative get the mod-97 checksum
            # (domestic forms pass through inside the validator)
            has_iban = rx[:2].isalpha() and rx[:2].isupper()
            add(
                _spec(
                    name,
                    rx,
                    ("account", "acct", "iban", "bank"),
                    validator="mod97" if has_iban else None,
                    approximate=True,
                )
            )
        else:
            add(_spec(name, rx, _name_hints(name), approximate=True))

    return registry


#: name tokens too generic to serve as column-name hints (a column named
#: "national_id" must not light up EVERY country's national-ID entity)
_GENERIC_NAME_TOKENS = frozenset(
    {
        "number",
        "id",
        "identification",
        "card",
        "of",
        "the",
        "registry",
        "register",
        "permanent",
        "personal",
        "national",
        "uniform",
        "unique",
        "civil",
        "government",
        "legal",
        "natural",
        "person",
        "entities",
        "mainland",
    }
)


def _name_hints(name: str) -> tuple[str, ...]:
    """Column-name context hints derived from an entity name's
    DISTINCTIVE tokens (country + domain word: tax / medicare / aadhaar
    / phone ...). Approximate entities with no curated context words
    would otherwise be structurally undetectable under the default
    ``use_context=True`` gate — their match fractions computed and then
    unconditionally discarded. A column named ``aadhaar_number`` now
    hints INDIA_AADHAAR_NUMBER; ``national_id`` alone hints nothing
    (generic tokens are excluded)."""
    return tuple(
        t for t in (tok.lower() for tok in name.split("_"))
        if t not in _GENERIC_NAME_TOKENS and len(t) >= 3
    )


ENTITY_REGISTRY: dict[str, EntitySpec] = _build_registry()

#: every entity name the reference's EntityDetector accepts
#: (`scripts/glue/s3-source/s3-source-script.py:24-281`); custom entities
#: registered at runtime are NOT in this tuple — it is the built-in set
ALL_ENTITY_NAMES: tuple[str, ...] = tuple(sorted(ENTITY_REGISTRY))

_VALID_VALIDATORS = ("luhn", "mod97", "nhs")


def register_custom_entity(
    name: str,
    pattern: str,
    *,
    context: tuple[str, ...] = (),
    validator: str | None = None,
    approximate: bool = False,
) -> EntitySpec:
    """Register a user-defined entity type — the engine's analogue of
    Glue's ``CreateCustomEntityType(Name, RegexString, ContextWords)``,
    which is where the reference's ``glue-custom-entity``-tagged sources
    route (`lambda/s3-trigger/app.py:17,217-239`). The spec participates
    in ``classify_columns`` exactly like a built-in: same anchored-regex
    aggregate, same context gating, same optional checksum validator.

    Classification executes the pattern as a JAVA regex (``rlike``), so
    validation compiles it with ``java.util.regex.Pattern`` when a
    SparkSession is active — a Python ``re.compile`` would reject valid
    Java patterns (``\\p{L}``) and accept invalid ones (``(?P<x>...)``).
    With no active session the check is skipped; the executor raises the
    same ``PatternSyntaxException`` on first use."""
    if name in ENTITY_REGISTRY:
        raise ValueError(f"entity type already registered: {name}")
    if validator is not None and validator not in _VALID_VALIDATORS:
        raise ValueError(f"unknown validator {validator!r}; use one of {_VALID_VALIDATORS}")
    spec = _spec(name, pattern, tuple(context), validator, approximate)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    jvm = None
    if spark is not None:
        try:
            jvm = spark._jvm
        except Exception:
            jvm = None  # e.g. Spark Connect: no JVM bridge -> skip check
    if jvm is not None:
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import IllegalArgumentException

        try:
            jvm.java.util.regex.Pattern.compile(spec.anchored)
        except (Py4JJavaError, IllegalArgumentException) as exc:
            # PatternSyntaxException (IllegalArgumentException once the
            # py4j client converts it) — a genuinely bad pattern; other
            # infrastructure errors propagate untouched
            raise ValueError(
                f"invalid Java regex for entity type {name}: {exc}"
            ) from None
    ENTITY_REGISTRY[name] = spec
    return spec


def unregister_custom_entity(name: str) -> None:
    """Remove a runtime-registered entity; built-ins are immutable."""
    if name in ALL_ENTITY_NAMES:
        raise ValueError(f"cannot unregister built-in entity type: {name}")
    ENTITY_REGISTRY.pop(name, None)


def resolve_entities(names: list[str] | tuple[str, ...] | None) -> list[EntitySpec]:
    """Resolve entity names to specs; None means the full registry
    (built-ins plus any registered custom entities)."""
    if names is None:
        return [ENTITY_REGISTRY[n] for n in sorted(ENTITY_REGISTRY)]
    unknown = [n for n in names if n not in ENTITY_REGISTRY]
    if unknown:
        raise KeyError(f"unknown entity types: {unknown}")
    return [ENTITY_REGISTRY[n] for n in names]
