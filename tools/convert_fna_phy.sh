#!/bin/sh
# convert_fna_phy.sh <in.fasta> <out.phy>
#
# Phylip-ish flattening of a (possibly multi-line) FASTA: first line is
# "<nrecords> <longest-line-len>" (via linelen rep=2, tools/linelen.c),
# then one record per line as "header seq [seq...]" with each record's
# internal line breaks turned into single spaces.
#
# Output-byte contract matches /root/reference/embalmlets/convert_fna_phy.sh,
# which chains four whole-file sed passes ("\n>" -> "#", "\n" -> " ",
# "#" -> "\n", then the first ">" of each line dropped); this version
# does the same rewrites in one in-memory pass, including sed's
# trailing-newline round-trip (the final newline, when present, is
# carried through untouched rather than becoming a space).
echo $(linelen "$1" 2) > "$2"
python3 -c '
import sys
t = open(sys.argv[1], "rb").read()
nl = t.endswith(b"\n")
if nl:
    t = t[:-1]
t = t.replace(b"\n>", b"#").replace(b"\n", b" ").replace(b"#", b"\n")
out = b"\n".join(l.replace(b">", b"", 1) for l in t.split(b"\n"))
sys.stdout.buffer.write(out + b"\n" if nl else out)
' "$1" >> "$2"
