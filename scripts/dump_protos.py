"""Reconstruct canonical .proto source files from the reference server's wire
descriptors, so our regenerated stubs are bit-compatible on the wire.

The reference (stablecabal/gyre) ships only generated python stubs
(gyre/generated/*_pb2.py); the api-interfaces submodule with the original
.proto files is empty. Wire compatibility requires identical field numbers
and types, so we recover the FileDescriptorProto embedded in each generated
module and emit clean .proto text, which we then compile with protoc.

Usage: python scripts/dump_protos.py /root/reference/gyre/generated /root/repo/proto
"""

import sys

from google.protobuf import descriptor_pb2

LABELS = {1: "optional", 2: "required", 3: "repeated"}
TYPES = {
    1: "double", 2: "float", 3: "int64", 4: "uint64", 5: "int32",
    6: "fixed64", 7: "fixed32", 8: "bool", 9: "string", 10: "group",
    11: None, 12: "bytes", 13: "uint32", 14: None, 15: "sfixed32",
    16: "sfixed64", 17: "sint32", 18: "sint64",
}


def rel_name(full, package):
    full = full.lstrip(".")
    if package and full.startswith(package + "."):
        return full[len(package) + 1:]
    return "." + full if "." in full else full


def field_decl(f, package, syntax, in_oneof):
    typ = TYPES.get(f.type)
    if typ is None:
        typ = rel_name(f.type_name, package)
    label = ""
    if f.label == 3:
        label = "repeated "
    elif syntax == "proto3":
        if f.proto3_optional and not in_oneof:
            label = "optional "
    else:
        label = LABELS[f.label] + " "
    opts = []
    if f.type in (3, 4, 5, 6, 7, 13, 15, 16, 17, 18, 1, 2, 8) and f.label == 3 and f.options.packed:
        opts.append("packed = true")
    if f.HasField("default_value"):
        dv = f.default_value
        if f.type == 9:
            dv = '"%s"' % dv
        opts.append("default = %s" % dv)
    optstr = " [%s]" % ", ".join(opts) if opts else ""
    return "%s%s %s = %d%s;" % (label, typ, f.name, f.number, optstr)


def emit_enum(e, indent):
    pad = "  " * indent
    out = ["%senum %s {" % (pad, e.name)]
    if e.options.allow_alias:
        out.append("%s  option allow_alias = true;" % pad)
    for v in e.value:
        out.append("%s  %s = %d;" % (pad, v.name, v.number))
    out.append("%s}" % pad)
    return out


def emit_message(m, package, syntax, indent=0):
    pad = "  " * indent
    out = ["%smessage %s {" % (pad, m.name)]
    map_entries = {}
    for nested in m.nested_type:
        if nested.options.map_entry:
            map_entries[m.name + "." + nested.name] = nested
        else:
            out.extend(emit_message(nested, package, syntax, indent + 1))
    for e in m.enum_type:
        out.extend(emit_enum(e, indent + 1))
    # group fields by oneof
    oneof_fields = {}
    plain = []
    for f in m.field:
        if f.HasField("oneof_index") and not f.proto3_optional:
            oneof_fields.setdefault(f.oneof_index, []).append(f)
        else:
            plain.append(f)
    for f in plain:
        # map field?
        if TYPES.get(f.type) is None and f.label == 3:
            short = f.type_name.split(".")[-1]
            key = m.name + "." + short
            if key in map_entries:
                me = map_entries[key]
                kt = TYPES.get(me.field[0].type) or rel_name(me.field[0].type_name, package)
                vt = TYPES.get(me.field[1].type) or rel_name(me.field[1].type_name, package)
                out.append("%s  map<%s, %s> %s = %d;" % (pad, kt, vt, f.name, f.number))
                continue
        out.append("%s  %s" % (pad, field_decl(f, package, syntax, False)))
    for idx, fields in sorted(oneof_fields.items()):
        out.append("%s  oneof %s {" % (pad, m.oneof_decl[idx].name))
        for f in fields:
            out.append("%s    %s" % (pad, field_decl(f, package, syntax, True)))
        out.append("%s  }" % pad)
    out.append("%s}" % pad)
    return out


def emit_file(fd):
    syntax = fd.syntax or "proto2"
    out = ['syntax = "%s";' % syntax, ""]
    if fd.package:
        out.append("package %s;" % fd.package)
        out.append("")
    for dep in fd.dependency:
        out.append('import "%s";' % dep)
    if fd.dependency:
        out.append("")
    if fd.options.go_package:
        out.append('option go_package = "%s";' % fd.options.go_package)
        out.append("")
    for e in fd.enum_type:
        out.extend(emit_enum(e, 0))
        out.append("")
    for m in fd.message_type:
        out.extend(emit_message(m, fd.package, syntax, 0))
        out.append("")
    for s in fd.service:
        out.append("service %s {" % s.name)
        for meth in s.method:
            cs = "stream " if meth.client_streaming else ""
            ss = "stream " if meth.server_streaming else ""
            out.append("  rpc %s (%s%s) returns (%s%s);" % (
                meth.name, cs, rel_name(meth.input_type, fd.package),
                ss, rel_name(meth.output_type, fd.package)))
        out.append("}")
        out.append("")
    return "\n".join(out) + "\n"


def main(gen_dir, out_dir):
    import os
    sys.path.insert(0, gen_dir)
    files = {}
    for mod in ["tensors_pb2", "generation_pb2", "engines_pb2", "dashboard_pb2"]:
        m = __import__(mod)
        fd = descriptor_pb2.FileDescriptorProto()
        fd.ParseFromString(m.DESCRIPTOR.serialized_pb)
        files[fd.name] = fd
    os.makedirs(out_dir, exist_ok=True)
    for name, fd in files.items():
        path = os.path.join(out_dir, os.path.basename(name))
        with open(path, "w") as fh:
            fh.write(emit_file(fd))
        print("wrote", path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
