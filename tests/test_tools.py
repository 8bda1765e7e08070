"""Golden tests for the native companion tools (tools/*.c) against the
reference's prebuilt binaries (reference embalmlets/bin/)."""
import os
import shutil
import stat
import subprocess

import numpy as np
import pytest

from . import golden

TOOLS_DIR = os.path.join(os.path.dirname(__file__), "..", "tools")
REF_BIN = "/root/reference/embalmlets/bin"


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    d = tmp_path_factory.mktemp("tools")
    res = subprocess.run(["make", "-C", TOOLS_DIR], capture_output=True,
                         text=True)
    assert res.returncode == 0, res.stderr
    return d


def _oracle(name, d):
    src = os.path.join(REF_BIN, name)
    dst = str(d / f"ref_{name}")
    if not os.path.exists(dst):
        shutil.copy(src, dst)
        os.chmod(dst, os.stat(dst).st_mode | stat.S_IXUSR)
    return dst


def _ours(name):
    return os.path.join(TOOLS_DIR, "bin", name)


def _dataset(d):
    rfa = str(d / "refs.fa")
    if not os.path.exists(rfa):
        rng = np.random.default_rng(4242)
        refs = golden.make_refs(rng, 25, lo=400, hi=800)
        golden.write_fasta(rfa, refs)
    return rfa


def test_llsim_bit_identical(built):
    d = built
    rfa = _dataset(d)
    r, m = str(d / "r_sim.fa"), str(d / "m_sim.fa")
    for exe, out in ((_oracle("llsim", d), r), (_ours("llsim"), m)):
        res = subprocess.run([exe, rfa, out, "400", "90", "3", "1234",
                              "RC"], capture_output=True, text=True)
        assert res.returncode == 0, res.stderr + res.stdout
    assert golden.diff_files(r, m) is None


def _b6_with_samples(d):
    b6 = str(d / "samp.b6")
    if not os.path.exists(b6):
        rng = np.random.default_rng(7)
        rows = []
        for i in range(200):
            s = f"s{int(rng.integers(1, 4))}"
            ref = f"ref{int(rng.integers(0, 25)):03d}"
            st = int(rng.integers(1, 300))
            tax = f"k__K{i % 2};p__P{i % 5};g__;s__"
            rows.append(f"{s}_q{i:04d}\t{ref}\t99.0\t90\t1\t0\t1\t90\t"
                        f"{st}\t{st + 90}\t1\t0\t{tax}")
        with open(b6, "w") as f:
            f.write("\n".join(rows) + "\n")
    return b6


def test_embalmulate_identical(built):
    d = built
    b6 = _b6_with_samples(d)
    ro, rt = str(d / "r_otu.tsv"), str(d / "r_tax.tsv")
    mo, mt = str(d / "m_otu.tsv"), str(d / "m_tax.tsv")
    subprocess.run([_oracle("embalmulate", d), b6, ro, rt, "GGtrim"],
                   capture_output=True, check=True)
    subprocess.run([_ours("embalmulate"), b6, mo, mt, "GGtrim"],
                   capture_output=True, check=True)
    assert golden.diff_files(ro, mo) is None
    assert golden.diff_files(rt, mt) is None


def test_bcov_identical(built):
    d = built
    rfa = _dataset(d)
    b6 = _b6_with_samples(d)
    lens = str(d / "rlens.tsv")
    with open(rfa) as f, open(lens, "w") as out:
        name = None
        for line in f:
            if line.startswith(">"):
                name = line[1:].strip()
            else:
                out.write(f"{name}\t{len(line.strip())}\n")
    subprocess.run([_oracle("bcov", d), b6, lens, str(d / "rb_")],
                   capture_output=True, check=True)
    subprocess.run([_ours("bcov"), b6, lens, str(d / "mb_")],
                   capture_output=True, check=True)
    for part in ("shared", "unique", "shared_binary", "unique_binary"):
        assert golden.diff_files(str(d / f"rb_{part}.txt"),
                                 str(d / f"mb_{part}.txt")) is None, part


def test_linfasta_identical(built):
    d = built
    rfa = _dataset(d)
    wrapped = str(d / "wrapped.fa")
    with open(rfa) as f, open(wrapped, "w") as out:
        for line in f:
            if line.startswith(">"):
                out.write(line)
            else:
                s = line.strip()
                for i in range(0, len(s), 37):
                    out.write(s[i:i + 37] + "\n")
    r, m = str(d / "r_lin.fa"), str(d / "m_lin.fa")
    # the oracle's void main returns garbage on success; compare bytes
    subprocess.run([_oracle("linfasta", d), wrapped, r],
                   capture_output=True)
    subprocess.run([_ours("linfasta"), wrapped, m],
                   capture_output=True, check=True)
    assert golden.diff_files(r, m) is None


def test_t2gg_identical(built):
    d = built
    nodes = str(d / "nodes.dmp")
    names = str(d / "names.dmp")
    with open(nodes, "w") as f:
        f.write("1\t|\t1\t|\tno rank\t|\n"
                "2\t|\t1\t|\tsuperkingdom\t|\n"
                "9\t|\t2\t|\tphylum\t|\n"
                "10\t|\t9\t|\tclass\t|\n"
                "11\t|\t10\t|\torder\t|\n"
                "12\t|\t11\t|\tfamily\t|\n"
                "13\t|\t12\t|\tgenus\t|\n"
                "14\t|\t13\t|\tspecies\t|\n"
                "15\t|\t14\t|\tno rank\t|\n"
                "20\t|\t2\t|\tclade\t|\n"
                "21\t|\t20\t|\tspecies\t|\n")
    with open(names, "w") as f:
        f.write("1\t|\troot\t|\t\t|\tscientific name\t|\n"
                "2\t|\tBacteria\t|\t\t|\tscientific name\t|\n"
                "9\t|\tFirmicutes\t|\t\t|\tscientific name\t|\n"
                "10\t|\tBacilli\t|\t\t|\tscientific name\t|\n"
                "11\t|\tBacillales\t|\t\t|\tscientific name\t|\n"
                "12\t|\tBacillaceae\t|\t\t|\tscientific name\t|\n"
                "13\t|\tBacillus\t|\t\t|\tscientific name\t|\n"
                "14\t|\tBacillus subtilis\t|\t\t|\tscientific name\t|\n"
                "15\t|\tB. subtilis 168\t|\t\t|\tscientific name\t|\n"
                "20\t|\tTerrabacteria\t|\t\t|\tscientific name\t|\n"
                "21\t|\tMystery bug\t|\t\t|\tscientific name\t|\n")
    r, m = str(d / "r_t2gg.txt"), str(d / "m_t2gg.txt")
    # the oracle's void main returns garbage on success; compare bytes
    subprocess.run([_oracle("t2gg", d), nodes, names, r],
                   capture_output=True)
    subprocess.run([_ours("t2gg"), nodes, names, m],
                   capture_output=True, check=True)
    assert golden.diff_files(r, m) is None


GBFF = """\
LOCUS       NC_000001            1000 bp    DNA     circular CON 01-JAN-2020
DEFINITION  Examplus organismus strain X1 chromosome 1.
ACCESSION   NC_000001
VERSION     NC_000001.2
KEYWORDS    RefSeq.
SOURCE      Examplus organismus
  ORGANISM  Examplus organismus strain X1
            Bacteria; Proteobacteria; Gammaproteobacteria;
            Enterobacterales; Enterobacteriaceae; Examplus.
REFERENCE   1  (bases 1 to 1000)
  AUTHORS   Nobody.
//
LOCUS       NC_000002            1000 bp    DNA     circular CON 01-JAN-2020
DEFINITION  Candidatus Otherus thingus chromosome.
ACCESSION   NC_000002
VERSION     NC_000002.1
SOURCE      Candidatus Otherus thingus
  ORGANISM  Candidatus Otherus thingus
            longnamecontinuation here
            Bacteria; Firmicutes; Bacilli;
            Lactobacillales.
COMMENT     Something.
//
"""

INSD_XML = """\
<GBSet>
<GBSeq>
<GBSeq_primary-accession>AB000001</GBSeq_primary-accession>
<GBSeq_organism>Examplus organismus strain Y</GBSeq_organism>
<GBSeq_taxonomy>Bacteria; Proteobacteria; Gammaproteobacteria\
</GBSeq_taxonomy>
<GBSeq_sequence>acgtacgtacgtnnnacgt</GBSeq_sequence>
</GBSeq>
<GBSeq>
<GBSeq_primary-accession>AB000002</GBSeq_primary-accession>
<GBSeq_organism>Mysterius sp. ABC</GBSeq_organism>
<GBSeq_taxonomy>Bacteria; Firmicutes</GBSeq_taxonomy>
<GBSeq_sequence>ttttgggg</GBSeq_sequence>
</GBSeq>
<GBSeq>
<GBSeq_primary-accession>AB000003</GBSeq_primary-accession>
<GBSeq_organism>Candidatus Otherus thingus longer name</GBSeq_organism>
<GBSeq_taxonomy>Bacteria</GBSeq_taxonomy>
<GBSeq_sequence>ccgg</GBSeq_sequence>
</GBSeq>
</GBSet>
"""


def _oracle_from_src(src_name, d):
    """Compile a reference embalmlets source as the test oracle."""
    src = os.path.join("/root/reference/embalmlets", src_name)
    dst = str(d / f"refsrc_{src_name}.bin")
    if not os.path.exists(dst):
        res = subprocess.run(["gcc", "-O1", "-w", "-o", dst, src],
                             capture_output=True, text=True)
        if res.returncode != 0:
            pytest.skip(f"cannot compile oracle {src_name}")
    return dst


def test_get_taxonomy_bit_identical(built):
    d = built
    gdir = d / "gbff_in"
    gdir.mkdir(exist_ok=True)
    (gdir / "test.gbff").write_text(GBFF)
    oracle = _oracle_from_src("get_taxonomy.c", d)
    r, m = str(d / "r_gettax.txt"), str(d / "m_gettax.txt")
    subprocess.run([oracle, str(gdir), r], capture_output=True)
    subprocess.run([_ours("get_taxonomy"), str(gdir), m],
                   capture_output=True, check=True)
    assert golden.diff_files(r, m) is None


def test_ripinsd_bit_identical(built):
    d = built
    xml = str(d / "insd.xml")
    with open(xml, "w") as f:
        f.write(INSD_XML)
    oracle = _oracle_from_src("get_taxonomy_ripINSD.c", d)
    for args in ([], ["2", "0", "0"], ["0", "1", "0"], ["0", "0", "1"]):
        r_fa, r_tx = str(d / "r_i.fa"), str(d / "r_i.tsv")
        m_fa, m_tx = str(d / "m_i.fa"), str(d / "m_i.tsv")
        subprocess.run([oracle, xml, r_fa, r_tx] + args,
                       capture_output=True)
        subprocess.run([_ours("ripinsd"), xml, m_fa, m_tx] + args,
                       capture_output=True, check=True)
        assert golden.diff_files(r_fa, m_fa) is None, args
        assert golden.diff_files(r_tx, m_tx) is None, args
