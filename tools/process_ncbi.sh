#!/bin/sh
# process_ncbi.sh <in.fasta> <out.fasta>
#
# Clean NCBI gene downloads (ftp / nuccore BioProject) into a
# linearized, deduplicated 2-line FASTA: strips "; from ... material"
# provenance suffixes, maps taxonomy-hostile punctuation to safe
# characters (':'->'-', '[' ']'->'{' '}', the rest to '_'), then keeps
# one record per distinct sequence (case-insensitive) in sequence sort
# order.
#
# Output-byte contract matches /root/reference/embalmlets/process_ncbi.sh
# (a 14-stage sed/tr chain); this version does the per-line rewrites in
# one python pass and keeps the identical sort(1) invocation so
# collation and -u tie-keeping behave exactly the same. The quirks of
# the original are preserved: rewrites apply to sequence lines too, and
# a literal '@' or '#' anywhere in the input takes part in the record
# framing exactly as it would there.
python3 -c '
import sys
P = [b"; from TYPE material", b"; from synonym TYPE material",
     b"; from verified material", b"; from reference material"]
M = bytes.maketrans(b": ,#[];/<", b"-___{}___")
out = []
for ln in open(sys.argv[1], "rb").read().split(b"\n"):
    for p in P:
        ln = ln.replace(p, b"")
    ln = ln.translate(M)
    if ln.startswith(b">"):
        ln = b"#" + ln[1:] + b"@"
    out.append(ln)
blob = b"".join(out).replace(b"#", b"\n").replace(b"@", b"\t")
sys.stdout.buffer.write(blob)
' "$1" | sort -u -t '	' -f -k 2,2 | python3 -c '
import sys
lines = sys.stdin.buffer.read().split(b"\n")
if lines and lines[-1] == b"":
    lines.pop()
# line 1 is the pre-first-record empty key, which sorts first; the
# reference drops it with tail -n +2
for ln in lines[1:]:
    sys.stdout.buffer.write(b">" + ln.replace(b"\t", b"\n") + b"\n")
' > "$2"
