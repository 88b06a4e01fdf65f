// Cross-language render-math test: replays the committed u8 buffers in
// tests/fixtures/render_fixtures.json against render.js — the executable
// half of the tap->pixels contract pin (the build image has no JS
// runtime; the Python mirror interactive_vit_tpu/wire/render.py replays
// the same file in CI). Run on any machine with node >= 20:
//
//     node --test frontend/js/
//
// Byte equality is the contract: ECMA ToUint8Clamp (clamp +
// round-half-even) on this side, np.clip + np.rint on the Python side.

import { test } from "node:test";
import assert from "node:assert/strict";
import { readFileSync } from "node:fs";
import { dirname, join } from "node:path";
import { fileURLToPath } from "node:url";

import {
	attnMaps,
	channelsRGBA,
	headGridCols,
	headMap,
	normToU8,
	overlayRGBA,
	queryRowGrid,
	tensorRGBA,
} from "./render.js";

const FIXTURES = join(
	dirname(fileURLToPath(import.meta.url)),
	"..",
	"..",
	"tests",
	"fixtures",
);

const { cases } = JSON.parse(
	readFileSync(join(FIXTURES, "render_fixtures.json"), "utf-8"),
);

function f32(b64) {
	const raw = Buffer.from(b64, "base64");
	return new Float32Array(
		raw.buffer.slice(raw.byteOffset, raw.byteOffset + raw.byteLength),
	);
}

function u8(b64) {
	return new Uint8Array(Buffer.from(b64, "base64"));
}

function assertBytes(got, expB64, label) {
	assert.deepEqual(new Uint8Array(got.buffer ?? got), u8(expB64), label);
}

for (const c of cases.filter((c) => c.fn === "normToU8")) {
	test(`normToU8 ${c.name}`, () => {
		const got = normToU8(f32(c.data), c.lo, c.hi);
		assertBytes(got, c.expected, c.name);
	});
}

for (const c of cases.filter((c) => c.fn === "tensorRGBA")) {
	test(`tensorRGBA ${c.name}`, () => {
		const got = tensorRGBA({ dims: c.dims, data: f32(c.data) });
		if (c.expected === null) {
			assert.equal(got, null);
			return;
		}
		assert.equal(got.w, c.expected.w);
		assert.equal(got.h, c.expected.h);
		assertBytes(got.rgba, c.expected.rgba, c.name);
	});
}

for (const c of cases.filter((c) => c.fn === "channelsRGBA")) {
	test(`channelsRGBA ${c.name}`, () => {
		const chans = c.chans.map((t) =>
			t === null ? null : { dims: t.dims, data: f32(t.data) },
		);
		const got = channelsRGBA(chans);
		if (c.expected === null) {
			assert.equal(got, null);
			return;
		}
		assert.equal(got.w, c.expected.w);
		assert.equal(got.h, c.expected.h);
		assertBytes(got.rgba, c.expected.rgba, c.name);
	});
}

for (const c of cases.filter((c) => c.fn === "attnPipeline")) {
	test(`attnPipeline ${c.name}`, () => {
		const exp = c.expected;
		const m = attnMaps({ dims: c.dims, data: f32(c.data) });
		assert.deepEqual(m.dims, exp.maps_dims);
		const H = m.dims[0];
		assert.equal(headGridCols(H), exp.grid_cols);
		exp.thumbs.forEach((texp, hi) => {
			const t = tensorRGBA(headMap(m, hi));
			assertBytes(t.rgba, texp.rgba, `thumb ${hi}`);
		});
		const hm = headMap(m, c.head);
		const full = tensorRGBA(hm);
		assertBytes(full.rgba, exp.full.rgba, "full");
		const grid = queryRowGrid(hm.data, m.dims[1], c.query);
		assert.deepEqual(grid.dims, exp.query_grid_dims);
		const g = tensorRGBA(grid);
		assertBytes(g.rgba, exp.query_grid.rgba, "query grid");
	});
}

for (const c of cases.filter((c) => c.fn === "overlayRGBA")) {
	test(`overlayRGBA ${c.name}`, () => {
		const got = overlayRGBA(
			{ dims: c.img.dims, data: f32(c.img.data) },
			{ dims: c.map.dims, data: f32(c.map.data) },
			c.query,
			c.alpha,
		);
		if (c.expected === null) {
			assert.equal(got, null);
			return;
		}
		assert.equal(got.w, c.expected.w);
		assert.equal(got.h, c.expected.h);
		assertBytes(got.rgba, c.expected.rgba, c.name);
	});
}
