// Cross-language wire-protocol test: decodes the byte-exact fixtures the
// Python codec committed under tests/fixtures/ and checks every field, then
// round-trips the JS encoder. This file is the executable half of the
// frontend contract pin (the build image has no JS runtime — see
// docs/frontend_playbook.md); run it on any machine with node >= 20:
//
//     node --test frontend/js/
//
// Format spec: /root/reference/main/message.py:22-127 and
// /root/reference/main/static/main/nodes/net_node.js:60-80,236-248.

import { test } from "node:test";
import assert from "node:assert/strict";
import { readFileSync } from "node:fs";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";

import {
	REQUEST_MAGIC,
	RESPONSE_MAGIC,
	decodeMessage,
	encodeMessage,
} from "./wire.js";

const FIXTURES = join(
	dirname(fileURLToPath(import.meta.url)),
	"..",
	"..",
	"tests",
	"fixtures",
);

function load(name) {
	const buf = readFileSync(join(FIXTURES, name));
	// slice to a standalone ArrayBuffer (readFileSync may share a pool)
	return buf.buffer.slice(buf.byteOffset, buf.byteOffset + buf.byteLength);
}

const expected = JSON.parse(
	readFileSync(join(FIXTURES, "wire_fixtures.json"), "utf-8"),
);

function sum(arr) {
	let s = 0;
	for (const v of arr) s += v;
	return s;
}

test("decodes the Python-encoded request fixture", () => {
	const { json, tensors } = decodeMessage(
		load("wire_request.bin"),
		REQUEST_MAGIC,
	);
	const exp = expected.request;
	assert.deepEqual(
		json.nodes.map((n) => n.endpoint),
		exp.nodes.map((n) => n.endpoint),
	);
	assert.deepEqual(json.nodes[0].params, exp.nodes[0].params);
	assert.deepEqual(json.taps, exp.taps);
	assert.equal(tensors.length, exp.tensor_dims.length);
	exp.tensor_dims.forEach((dims, i) => {
		assert.deepEqual(tensors[i].dims, dims);
		assert.ok(Math.abs(sum(tensors[i].data) - exp.tensor_sums[i]) < 1e-4);
	});
	// the graph-input edges reference tensor blocks by index
	const tensorEdges = json.edges.filter((e) => "tensor" in e);
	assert.equal(tensorEdges.length, exp.tensor_dims.length);
});

test("decodes the Python-encoded response fixture", () => {
	const { json, tensors } = decodeMessage(
		load("wire_response.bin"),
		RESPONSE_MAGIC,
	);
	const exp = expected.response;
	assert.deepEqual(json, exp.routes);
	exp.tensor_dims.forEach((dims, i) => assert.deepEqual(tensors[i].dims, dims));
	assert.deepEqual(Array.from(tensors[1].data), exp.c_values);
	const attn = tensors[2].data;
	assert.equal(attn[0], exp.attn_first_last[0]);
	assert.equal(attn[attn.length - 1], exp.attn_first_last[1]);
});

test("decodes the bf16-tagged response fixture (negotiated extension)", () => {
	const { json, tensors } = decodeMessage(
		load("wire_response_bf16.bin"),
		RESPONSE_MAGIC,
	);
	const exp = expected.response_bf16;
	assert.ok(json.every((e) => e.dtype === "bf16"));
	assert.deepEqual(Array.from(tensors[0].data), exp.o_values);
	assert.deepEqual(tensors[1].dims, exp.attn_dims);
	const attn = tensors[1].data;
	assert.equal(attn[0], exp.attn_first_last[0]);
	assert.equal(attn[attn.length - 1], exp.attn_first_last[1]);
});

test("JS encoder round-trips and matches the header spec", () => {
	const obj = {
		nodes: [{ endpoint: "cos", params: { A: "2.0" } }],
		edges: [{ out_port: { node: 0, channel: "o" }, tensor: 0 }],
	};
	const t = { dims: [2, 3], data: new Float32Array([1, 2, 3, 4, 5, 6]) };
	const buf = encodeMessage(obj, [t], REQUEST_MAGIC);
	const view = new DataView(buf);
	assert.equal(view.getUint32(0, true), buf.byteLength);
	assert.equal(view.getUint32(4, true), REQUEST_MAGIC);
	assert.equal(view.getUint32(8, true), 1);
	const { json, tensors } = decodeMessage(buf, REQUEST_MAGIC);
	assert.deepEqual(json, obj);
	assert.deepEqual(tensors[0].dims, [2, 3]);
	assert.deepEqual(Array.from(tensors[0].data), [1, 2, 3, 4, 5, 6]);
});

test("bad magic and truncation are rejected", () => {
	const buf = encodeMessage({ nodes: [], edges: [] }, [], REQUEST_MAGIC);
	assert.throws(() => decodeMessage(buf, RESPONSE_MAGIC), /bad magic/);
	const short = buf.slice(0, buf.byteLength - 2);
	assert.throws(() => decodeMessage(short, REQUEST_MAGIC), /truncated/);
});

// ---- per-node-kind contract fixtures (tests/fixtures/node_fixtures.json) ----
// Every client node kind has a pinned tuple {saved graph, client request
// bytes, expected outputs, response bytes f32+bf16}. The JS side of the
// contract: the JS ENCODER must reproduce the committed request bytes from
// the request JSON (they were generated with JSON.stringify-compatible
// compact separators — byte parity is exact), and the JS decoder must route
// the committed responses to the expected (node, channel) values.

const nodeFixtures = JSON.parse(
	readFileSync(join(FIXTURES, "node_fixtures.json"), "utf-8"),
);

function b64bytes(b64) {
	const bin = atob(b64);
	const out = new Uint8Array(bin.length);
	for (let i = 0; i < bin.length; i++) out[i] = bin.charCodeAt(i);
	return out.buffer;
}

for (const [kind, fx] of Object.entries(nodeFixtures)) {
	if (fx.no_request) continue;
	test(`node contract: ${kind} request bytes reproduce via JS encoder`, () => {
		const committed = new Uint8Array(b64bytes(fx.request_b64));
		const { json, tensors } = decodeMessage(
			b64bytes(fx.request_b64),
			REQUEST_MAGIC,
		);
		assert.deepEqual(json, fx.request_json);
		const ours = new Uint8Array(
			encodeMessage(fx.request_json, tensors, REQUEST_MAGIC),
		);
		assert.deepEqual(ours, committed);
	});

	test(`node contract: ${kind} responses route to expected outputs`, () => {
		for (const key of ["response_b64", "response_bf16_b64"]) {
			const { json, tensors } = decodeMessage(
				b64bytes(fx[key]),
				RESPONSE_MAGIC,
			);
			const atol = key.includes("bf16") ? 5e-2 : 5e-5;
			const seen = new Set();
			json.forEach((route, i) => {
				const k = `${route.node}/${route.channel}`;
				seen.add(k);
				const exp = nodeFixtures[kind].expected[k];
				assert.ok(exp, `unexpected route ${k} in ${kind}`);
				assert.deepEqual(tensors[i].dims, exp.dims);
				const got = tensors[i].data;
				assert.equal(got.length, exp.values.length);
				for (let j = 0; j < got.length; j++) {
					const tol = atol + Math.abs(exp.values[j]) * (key.includes("bf16") ? 2e-2 : 0);
					assert.ok(
						Math.abs(got[j] - exp.values[j]) <= tol,
						`${kind} ${k}[${j}]: ${got[j]} vs ${exp.values[j]}`,
					);
				}
			});
			assert.equal(seen.size, Object.keys(fx.expected).length);
		}
	});
}

// ---- client-local evaluator vs the pinned server outputs -------------------
// localops.js must produce the SAME values the server computed for every
// local-capable kind (the zero-round-trip contract): rebuild each scenario
// from its saved graph, feed the request fixture's tensors as img_src
// outputs, and compare against the fixture's expected values.

import { LOCAL_KINDS, evalLocal } from "./localops.js";

const SOURCES = new Set(["img_src"]);
const VIEWERS = new Set([
	"img_view", "multi_view", "category", "attn_view", "overlay",
]);

for (const [name, fx] of Object.entries(nodeFixtures)) {
	if (fx.no_request || fx.error) continue;
	const insts = fx.saved.nodes.map((n) => n.instance);
	const computeKinds = insts.filter(
		(i) => !SOURCES.has(i.kind) && !VIEWERS.has(i.kind),
	);
	if (!computeKinds.length || !computeKinds.every((i) => LOCAL_KINDS.has(i.kind))) {
		continue; // scenario needs the server (net_node, noise, ...)
	}
	test(`local eval: ${name} matches the server's pinned outputs`, () => {
		const { tensors } = decodeMessage(b64bytes(fx.request_b64), REQUEST_MAGIC);
		// request tensors are deduped in edge order; replay the same walk
		// to map source node index -> tensor (make_node_fixtures.py)
		const srcTensor = new Map();
		let ti = 0;
		for (const e of fx.saved.edges) {
			const si = e.in_port.node;
			const di = e.out_port.node;
			if (VIEWERS.has(insts[di].kind)) continue;
			if (SOURCES.has(insts[si].kind) && !srcTensor.has(si)) {
				srcTensor.set(si, tensors[ti++]);
			}
		}
		const results = new Map(); // node idx -> Map(ch -> tensor)
		const readFor = (idx) => (ch) => {
			const e = fx.saved.edges.find(
				(x) => x.out_port.node === idx && x.out_port.channel === ch,
			);
			if (!e) return null;
			const si = e.in_port.node;
			if (SOURCES.has(insts[si].kind)) return srcTensor.get(si) ?? null;
			return results.get(si)?.get(e.in_port.channel) ?? null;
		};
		const evalIdx = (idx) => {
			if (results.has(idx)) return;
			// inputs first (saved graphs here are topologically ordered)
			results.set(idx, evalLocal(insts[idx].kind, insts[idx], readFor(idx)));
		};
		// wire-node indices: non-source non-viewer in node order (the
		// fixture's expected keys use these)
		const wireIndex = new Map();
		insts.forEach((inst, i) => {
			if (!SOURCES.has(inst.kind) && !VIEWERS.has(inst.kind)) {
				wireIndex.set(i, wireIndex.size);
			}
		});
		for (const i of wireIndex.keys()) evalIdx(i);
		for (const [key, exp] of Object.entries(fx.expected)) {
			const [wi, ch] = key.split("/");
			const nodeIdx = [...wireIndex.entries()].find(
				([, w]) => w === Number(wi),
			)[0];
			const got = results.get(nodeIdx).get(ch);
			assert.ok(got, `${name}: no local output ${key}`);
			assert.deepEqual(got.dims, exp.dims);
			for (let j = 0; j < exp.values.length; j++) {
				assert.ok(
					Math.abs(got.data[j] - exp.values[j]) <= 5e-5 + Math.abs(exp.values[j]) * 1e-5,
					`${name} ${key}[${j}]: ${got.data[j]} vs ${exp.values[j]}`,
				);
			}
		}
	});
}

// ---- partition-decision replay (VERDICT r3 #2) -------------------------------
// The SAME rule that graph.js uses live (partition.js is the single
// implementation) replayed against the committed scenario fixtures whose
// expected local sets are hand-authored and whose request bytes were pinned
// by the Python mirror (interactive_vit_tpu/wire/partition.py). Divergence
// between the two implementations fails here.

import { localSet, planRequest, readySet } from "./partition.js";

const partitionFixtures = JSON.parse(
	readFileSync(join(FIXTURES, "partition_fixtures.json"), "utf-8"),
);

function fxSources(fx) {
	const out = new Map();
	for (const [i, s] of Object.entries(fx.sources_b64)) {
		out.set(Number(i), { dims: s.shape, data: new Float32Array(b64bytes(s.b64)) });
	}
	return out;
}

// the Python mirror uses snake_case has_tensor; partition.js hasTensor
function toJsGraph(g) {
	return {
		nodes: g.nodes.map((n) => ({ ...n, hasTensor: n.has_tensor })),
		edges: g.edges,
	};
}

for (const [name, fx] of Object.entries(partitionFixtures)) {
	test(`partition decision: ${name}`, () => {
		const g = toJsGraph(fx.graph);
		const ready = readySet(g);
		assert.deepEqual(ready, fx.expected_ready, "ready set");
		const local = localSet(g, ready);
		assert.deepEqual([...local].sort((a, b) => a - b), fx.expected_local, "local set");
		const plan = planRequest(g, ready, local);
		assert.deepEqual(plan.req, fx.plan.req);
		assert.deepEqual(plan.taps, fx.plan.taps);
		assert.deepEqual(plan.edges, fx.plan.edges);
		assert.deepEqual(plan.tensors, fx.plan.tensors);
	});

	if (fx.request_b64) {
		test(`partition request bytes: ${name}`, () => {
			const srcs = fxSources(fx);
			const tensors = fx.plan.tensors.map((i) => srcs.get(i));
			const raw = new Uint8Array(
				encodeMessage(fx.request_json, tensors, REQUEST_MAGIC),
			);
			assert.deepEqual(raw, new Uint8Array(b64bytes(fx.request_b64)), "request bytes");
		});
	}

	if (fx.fallback_request_b64) {
		test(`partition fallback request bytes: ${name}`, () => {
			// LocalFallback clears the local set; re-plan with local = {}
			const g = toJsGraph(fx.graph);
			const plan = planRequest(g, fx.expected_ready, new Set());
			assert.deepEqual(plan, fx.fallback_plan);
			const srcs = fxSources(fx);
			const tensors = plan.tensors.map((i) => srcs.get(i));
			const raw = new Uint8Array(
				encodeMessage(fx.fallback_request_json, tensors, REQUEST_MAGIC),
			);
			assert.deepEqual(raw, new Uint8Array(b64bytes(fx.fallback_request_b64)));
		});
	}
}
