"""VCF model round-trip tests (svtyper_tpu/vcfio)."""

import io

from svtyper_tpu.vcfio.model import Genotype, Variant, Vcf
from svtyper_tpu.vcfio.reader import read_vcf_lines

HEADER = """##fileformat=VCFv4.2
##reference=hs37d5
##INFO=<ID=SVTYPE,Number=1,Type=String,Description="Type of structural variant">
##INFO=<ID=END,Number=1,Type=Integer,Description="End position">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA12878
"""

RECORD = "1\t1000\tdel_1\tN\t<DEL>\t.\t.\tSVTYPE=DEL;END=2000\tGT\t./."


def _make_vcf():
    v = Vcf()
    v.add_header(HEADER.splitlines())
    return v


def test_header_parse():
    v = _make_vcf()
    assert v.file_format == "VCFv4.2"
    assert v.reference == "hs37d5"
    assert v.info_list == ["SVTYPE", "END"]
    assert v.format_list == ["GT"]
    assert v.sample_list == ["NA12878"]


def test_header_roundtrip_verbatim():
    v = _make_vcf()
    assert v.get_header() == HEADER


def test_add_format_splices_after_existing_formats():
    v = _make_vcf()
    v.add_format("GQ", 1, "Integer", "Genotype quality")
    hdr = v.get_header().splitlines()
    gt_i = next(i for i, l in enumerate(hdr) if "ID=GT," in l)
    gq_i = next(i for i, l in enumerate(hdr) if "ID=GQ," in l)
    assert gq_i == gt_i + 1
    assert hdr[-1].startswith("#CHROM")
    # dedup
    v.add_format("GQ", 1, "Integer", "Genotype quality")
    assert v.format_list.count("GQ") == 1


def test_variant_passthrough_byte_exact():
    v = _make_vcf()
    var = Variant(RECORD, v)
    assert var.get_var_string() == RECORD


def test_variant_info():
    v = _make_vcf()
    var = Variant(RECORD, v)
    assert var.get_info("SVTYPE") == "DEL"
    assert var.get_info("END") == "2000"
    assert var.get_info("MISSING") is None
    var.set_info("IMPRECISE", None)
    assert var.has_info("IMPRECISE")
    assert "IMPRECISE" in var.get_var_string()


def test_genotype_emission_order_and_missing():
    v = _make_vcf()
    for fid in ("GQ", "SQ", "GL"):
        v.add_format(fid, 1, "Float", fid)
    var = Variant(RECORD, v)
    g = var.genotype("NA12878")
    g.set_format("GT", "0/1")
    g.set_format("GL", "-10,-1,-20")
    g.set_format("GQ", 42)
    var.genotyped = True
    var.qual = 3.14159
    out = var.get_var_string()
    cols = out.split("\t")
    assert cols[5] == "3.14"  # QUAL %.2f when genotyped
    assert cols[8] == "GT:GQ:GL"  # GT first, then declaration order; SQ unset
    assert cols[9] == "0/1:42:-10,-1,-20"


def test_undeclared_format_raises():
    v = _make_vcf()
    var = Variant(RECORD, v)
    g = var.genotype("NA12878")
    try:
        g.set_format("XX", 1)
    except KeyError:
        pass
    else:
        raise AssertionError("expected KeyError")


def test_reader_split():
    stream = io.StringIO(HEADER + RECORD + "\n" + RECORD + "\n")
    header, body = read_vcf_lines(stream)
    assert header == HEADER.splitlines()
    assert list(body) == [RECORD, RECORD]


def test_sample_columns_parse_lazily():
    """Pre-existing sample columns must not build Genotype objects at
    construction (Genotype<->Variant is a reference cycle; eager
    construction backlogged ~40k records between gen-2 GC passes in the
    r5 CLI soak) — but active_formats is still populated eagerly and
    the values round-trip once genotype() is called."""
    from svtyper_tpu.vcfio.model import Variant, Vcf

    vcf = Vcf()
    vcf.add_header([
        "##fileformat=VCFv4.2",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
    ])
    v = Variant(
        "chr1\t100\tx\tN\t<DEL>\t.\t.\tSVTYPE=DEL\tGT:SU\t./.:5", vcf
    )
    assert v.active_formats == {"GT", "SU"}
    assert not v._gts  # lazy: no Genotype objects yet
    g = v.genotype("S1")
    assert g.get_format("GT") == "./."
    assert g.get_format("SU") == "5"
    # all-dot values never activate a field
    v2 = Variant(
        "chr1\t200\ty\tN\t<DEL>\t.\t.\tSVTYPE=DEL\tGT:SU\t./.:.", vcf
    )
    assert v2.active_formats == {"GT"}
